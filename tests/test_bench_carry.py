"""BENCH_DETAILS.json carry semantics (bench.py::_flush_details): a thin
or killed bench run must not DROP rich records from a previous session
(r4 lesson), must LABEL what it carries (r3 lesson), and must keep
platform provenance through the carry chain so a CPU-fallback session's
walls can never read as chip numbers (r5 lesson)."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _flush_to(tmp_path, monkeypatch, details, prev):
    out = tmp_path / "details.json"
    monkeypatch.setattr(bench, "DETAILS_PATH", str(out))
    monkeypatch.setattr(bench, "_regen_tables", lambda: None)
    bench._flush_details(details, prev)
    with open(out) as f:
        return json.load(f)


def test_missing_carry_keys_are_carried_and_labelled(tmp_path, monkeypatch):
    prev = {
        "platform": "tpu",
        "relatedness": {"device_queries_per_s": 9239.2},
        "tunnel": {"upload_mb_per_s": 35.0},
    }
    got = _flush_to(tmp_path, monkeypatch, {"platform": "cpu"}, prev)
    assert got["relatedness"]["device_queries_per_s"] == 9239.2
    assert got["relatedness"]["carried_from_previous_session"] is True
    assert got["relatedness"]["carried_from_platform"] == "tpu"
    assert sorted(got["carried_keys"]) == ["relatedness", "tunnel"]


def test_fresh_records_win_over_previous(tmp_path, monkeypatch):
    prev = {"platform": "cpu", "relatedness": {"device_queries_per_s": 1.0}}
    fresh = {"platform": "tpu",
             "relatedness": {"device_queries_per_s": 9000.0}}
    got = _flush_to(tmp_path, monkeypatch, fresh, prev)
    assert got["relatedness"] == {"device_queries_per_s": 9000.0}
    assert "carried_keys" not in got
    assert got["platform"] == "tpu"


def test_platform_provenance_survives_a_second_carry(tmp_path, monkeypatch):
    """tpu record -> carried by a cpu session -> carried again: the stamp
    must still say tpu (the ORIGIN platform), not the middle session's."""
    origin = {"platform": "tpu", "tunnel": {"upload_mb_per_s": 35.0}}
    mid = _flush_to(tmp_path, monkeypatch, {"platform": "cpu"}, origin)
    final = _flush_to(tmp_path, monkeypatch, {"platform": "cpu"}, mid)
    assert final["tunnel"]["carried_from_platform"] == "tpu"


def test_non_dict_carry_values_pass_through(tmp_path, monkeypatch):
    prev = {"device_only_seqs_per_s_f32": 1895.8}
    got = _flush_to(tmp_path, monkeypatch, {}, prev)
    assert got["device_only_seqs_per_s_f32"] == 1895.8
    assert got["carried_keys"] == ["device_only_seqs_per_s_f32"]
