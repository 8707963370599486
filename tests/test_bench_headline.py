"""The flagship bench number must survive the driver's stdout capture.

The driver keeps only the LAST ~2000 chars of bench stdout and parses the
final line as JSON; round 4's single giant JSON line was truncated, so
BENCH_r04.json certified none of the headline keys (VERDICT r4 item 1).
Contract under test:

- ``bench.emit_result`` prints a compact (≤1500 char) standalone JSON object
  as the very LAST stdout line, carrying the headline keys + a pointer to
  the full sidecar dict (docs/BENCH_FULL.json) written by the same run;
- ``scripts.gen_headline.parse_bench`` recovers that line from a
  driver-shaped artifact (``parsed`` may be null when the driver's own
  parse failed) and re-joins it with the sidecar via the checksum.
"""

from __future__ import annotations

import json
import types

import pytest


@pytest.fixture()
def bench_mod(tmp_path, monkeypatch):
    import bench

    # redirect the sidecar (derived from bench.__file__) into tmp
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    monkeypatch.setenv("MEDTOK_BENCH_EXTRAS", "0")
    return bench


FAKE_JAX = types.SimpleNamespace(device_count=lambda: 1)


def _extra():
    # representative of a real packed-sweep result dict, including the big
    # per_shape block that blew the old single-line format past 2000 chars
    return {
        "mfu_export": 0.306,
        "device_busy_est_s": 29.7,
        "pack_row_utilization": 0.937,
        "n_steps": 320,
        "host_spin_ms": 240.0,
        "host_phases_s": {"make_batch": 27.1, "tokenize": 9.3},
        "per_shape": {
            f"nb16_C{c}_epg32": {"steps": 40, "device_ms": 66.0,
                                 "device_s": 2.6}
            for c in (512, 1024, 2048, 3072, 4096)
        },
        "train_packed_step_ms_b1024": 64.9,
        "train_pack_speedup": 2.78,
        "mfu_train": 0.348,
        "kernel_speedup": 1.65,
        "kernel_indices_exact": True,
        "kernel_sweep": {"8192x21000": {"xla_ms": 7.62, "pallas_ms": 4.63}},
    }


def _run_emit(bench_mod, capsys):
    bench_mod.emit_result(FAKE_JAX, None, wall=35.2, t_tok=9.3,
                          checksum=123.5, extra=_extra())
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) >= 2
    return out


def test_last_line_is_compact_standalone_json(bench_mod, capsys):
    lines = _run_emit(bench_mod, capsys)
    last = lines[-1]
    assert len(last) <= 1500, "compact line must survive 2000-char tail"
    d = json.loads(last)
    for key in ("metric", "value", "unit", "vs_baseline", "wall_s",
                "checksum", "mfu_export", "mfu_train", "n_chips", "full"):
        assert key in d, f"headline key {key!r} missing from compact line"
    assert d["host_make_batch_s"] == 27.1
    # the giant full line still prints first (human/debug consumption)
    full = json.loads(lines[0])
    assert "per_shape" in full and "kernel_sweep" in full


def test_sidecar_written_and_checksum_matched(bench_mod, capsys, tmp_path):
    lines = _run_emit(bench_mod, capsys)
    compact = json.loads(lines[-1])
    sidecar = tmp_path / compact["full"]
    assert sidecar.exists()
    full = json.loads(sidecar.read_text())
    assert full["checksum"] == compact["checksum"]
    assert full["per_shape"]  # the bulk data lives in the sidecar


def test_gen_headline_recovers_from_truncated_artifact(
        bench_mod, capsys, tmp_path, monkeypatch):
    import scripts.gen_headline as gh

    lines = _run_emit(bench_mod, capsys)
    # driver-shaped artifact: parsed=null (its own parse failed), tail keeps
    # only the last 2000 chars — which must still include the compact line
    tail = "\n".join(lines)[-2000:]
    art = tmp_path / "BENCH_r99.json"
    art.write_text(json.dumps(
        {"n": 99, "cmd": "python bench.py", "rc": 0, "tail": tail,
         "parsed": None}))
    monkeypatch.setattr(gh, "ROOT", tmp_path)
    d = gh.parse_bench(art)
    assert d is not None
    # merged with the sidecar: bulk keys are back
    assert d["value"] == pytest.approx(600_000 / 35.2, rel=1e-3)
    assert "per_shape" in d and "kernel_sweep" in d
    assert d["mfu_export"] == 0.306


def test_gen_headline_ignores_stale_sidecar(bench_mod, capsys, tmp_path,
                                            monkeypatch):
    import scripts.gen_headline as gh

    lines = _run_emit(bench_mod, capsys)
    compact = json.loads(lines[-1])
    # corrupt the sidecar checksum: merge must be refused, compact keys kept
    sidecar = tmp_path / compact["full"]
    full = json.loads(sidecar.read_text())
    full["checksum"] = -1.0
    sidecar.write_text(json.dumps(full))
    art = tmp_path / "BENCH_r99.json"
    art.write_text(json.dumps({"rc": 0, "tail": lines[-1], "parsed": None}))
    monkeypatch.setattr(gh, "ROOT", tmp_path)
    d = gh.parse_bench(art)
    assert d is not None
    assert "per_shape" not in d  # stale bulk data NOT merged in
    assert d["mfu_export"] == 0.306  # compact keys still present


def test_gen_headline_table_has_timing_method_note(tmp_path, monkeypatch):
    import scripts.gen_headline as gh

    d = {"metric": "codes_per_sec_e2e_600k_tokenize_embed", "value": 17000.0,
         "wall_s": 35.2, "vs_baseline": 13.6, "mfu_export": 0.306}
    table = gh.build_table("BENCH_r05.json", d)
    assert "Timing-method note" in table  # VERDICT r4 item 10
    assert "BENCH_r05.json" in table
