"""Single source of truth for headline numbers (VERDICT r3 item 8).

Reads the newest BENCH_r*.json driver artifact (plus docs/TRAIN_SUSTAINED.json
if present) and rewrites the metric tables between
``<!-- BENCH_TABLE_START -->`` / ``<!-- BENCH_TABLE_END -->`` markers in
README.md and docs/PERF.md, so no document can drift from the measured
artifact. Run after every driver bench: ``python scripts/gen_headline.py``.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
START = "<!-- BENCH_TABLE_START -->"
END = "<!-- BENCH_TABLE_END -->"


def parse_bench(path: Path) -> dict | None:
    raw = json.loads(path.read_text())
    d = raw.get("parsed", raw)
    if isinstance(d, str):
        d = json.loads(d)
    if d is None:
        # The driver keeps only the last ~2000 chars of stdout; recover the
        # compact headline line bench.py prints LAST (VERDICT r4 item 1).
        for line in reversed(raw.get("tail", "").strip().splitlines()):
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    d = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
    if not isinstance(d, dict) or "value" not in d:
        return None
    # Re-join the compact headline with the full sidecar dict written by the
    # same bench run (matched via checksum so a stale sidecar can't lie).
    if "full" in d:
        fp = ROOT / str(d["full"])
        if fp.exists():
            full = json.loads(fp.read_text())
            if full.get("checksum") == d.get("checksum"):
                d = {**full, **d}
    return d


def latest_bench() -> tuple[str, dict]:
    benches = sorted(ROOT.glob("BENCH_r*.json"))
    # Newest driver artifact whose headline survived the stdout capture
    # (BENCH_r04's giant single line was truncated away — VERDICT r4 item 1).
    driver: tuple[Path, dict] | None = None
    for path in reversed(benches):
        d = parse_bench(path)
        if d is not None:
            driver = (path, d)
            break
    # An in-session `python bench.py` run mirrors its full dict to
    # docs/BENCH_FULL.json; when that sidecar is NEWER than every driver
    # artifact it is the freshest measurement on this chip — use it (the
    # driver's next end-of-round run becomes BENCH_r{N+1} and wins again).
    sidecar = ROOT / "docs" / "BENCH_FULL.json"
    if sidecar.exists():
        newer = all(
            sidecar.stat().st_mtime > p.stat().st_mtime for p in benches
        )
        if newer:
            d = json.loads(sidecar.read_text())
            if isinstance(d, dict) and "value" in d:
                tag = "docs/BENCH_FULL.json (in-session run"
                if driver is not None:
                    tag += (
                        "; latest parseable driver artifact "
                        f"{driver[0].name}"
                    )
                return tag + ")", d
    if driver is not None:
        return driver[0].name, driver[1]
    sys.exit("no parseable bench artifact found")


def fmt(x, nd=1):
    return f"{x:,.{nd}f}" if isinstance(x, (int, float)) else str(x)


def build_table(src: str, d: dict) -> str:
    rows: list[tuple[str, str]] = []
    rows.append((
        "600K-code heavy-tail tokenize+embed, ONE chip",
        f"**{fmt(d['wall_s'], 2)} s** = {fmt(d['value'])} codes/s = "
        f"**{fmt(d['vs_baseline'], 1)}× the per-chip north-star**",
    ))
    if "mfu_export" in d:
        rows.append(("export MFU (packed sweep)", fmt(d["mfu_export"], 3)))
    if "train_packed_step_ms_b1024" in d:
        rows.append((
            "tokenizer train step, packed B=1024",
            f"{fmt(d['train_packed_step_ms_b1024'])} ms "
            f"({fmt(d['train_pack_speedup'], 2)}× over padded), "
            f"{fmt(d['train_packed_codes_per_sec_b1024'])} codes/s, "
            f"mfu {fmt(d.get('mfu_train', float('nan')), 3)}",
        ))
    ks = d.get("kernel_sweep", {})
    if ks:
        parts = [f"{fmt(v['speedup'], 2)}× @ {shape}"
                 for shape, v in sorted(ks.items())]
        exact = all(v.get("exact") for v in ks.values())
        rows.append((
            "fused top-k kernel vs XLA",
            ", ".join(parts)
            + (" (exact indices everywhere)" if exact else " (NOT exact!)"),
        ))
    if "vq_backend_sweep" in d:
        parts = [f"{name}: {fmt(v, 1)} ms"
                 for name, v in d["vq_backend_sweep"].items()]
        rows.append(("VQ sweep backends (8192×21000×64)", ", ".join(parts)))
    if "flash_b256_ms" in d:
        rows.append((
            "EHR flash attention B=256 L=2048",
            f"{fmt(d['flash_b256_ms'])} ms/layer-step (dense needs ~17 GB "
            f"scores: does not fit HBM)",
        ))
    if "ehr_train_step_ms_b256" in d:
        rows.append((
            f"EHR train step ({d.get('ehr_shape', '')})",
            f"{fmt(d['ehr_train_step_ms_b256'])} ms = "
            f"{fmt(d['ehr_train_patients_per_sec'])} patients/s",
        ))
    if "qa_finetune_step_ms" in d:
        rows.append((
            "QA LoRA finetune step (1B-shape, B=16 L=512)",
            f"{fmt(d['qa_finetune_step_ms'])} ms = "
            f"{fmt(d['qa_finetune_tokens_per_sec'])} tokens/s",
        ))
    if "ehr_parse_patients_per_sec" in d:
        rows.append((
            "EHR CSV parse (MIMIC-III schema)",
            f"{fmt(d['ehr_parse_patients_per_sec'])} patients/s = "
            f"{fmt(d['ehr_parse_event_rows_per_sec'])} event rows/s",
        ))
    ts = d.get("train_sustained")
    if not ts:
        p = ROOT / "docs" / "TRAIN_SUSTAINED.json"
        ts = json.loads(p.read_text()) if p.exists() else None
    if ts:
        rows.append((
            f"sustained train, {ts['steps']} packed steps @ B="
            f"{ts['global_batch']} (real chip)",
            f"loss {fmt(ts['loss_first'], 2)} → {fmt(ts['loss_final'], 2)}, "
            f"usage {fmt(ts['usage_shared_first'], 3)} → "
            f"{fmt(ts['usage_shared_final'], 3)}, "
            f"{fmt(ts['steps_per_sec_median'], 2)} steps/s; SIGKILL+resume "
            + ("**bitwise-equal**" if ts.get("resume_equal")
               else f"max rel err {ts.get('resume_max_rel_err', 'n/a')}"),
        ))
    km = d.get("train_sustained_kmeans")
    kr = d.get("train_sustained_kmeans_revival")
    if km and kr:
        rows.append((
            "kmeans/norm-EMA sustained variant (same harness)",
            f"plain: loss {fmt(km['loss_first'], 1)} → "
            f"{fmt(km['loss_final'], 1)}, usage "
            f"{fmt(km['usage_shared_final'], 3)} (dead-code freeze); "
            f"+revival: loss → **{fmt(kr['loss_final'], 2)}**, usage "
            f"**{fmt(kr['usage_shared_final'], 3)}**; both resumes "
            + ("bitwise-equal" if km.get("resume_equal")
               and kr.get("resume_equal") else "NOT bitwise"),
        ))
    lines = [START, f"Source: `{src}` (driver-captured; regenerate with "
                    f"`python scripts/gen_headline.py`).", "",
             "| metric | measured |", "|---|---|"]
    lines += [f"| {k} | {v} |" for k, v in rows]
    lines += [
        "",
        "*Timing-method note: kernel/step rows in `BENCH_r01`–`BENCH_r03` "
        "used per-call fetch timing, which inflated sub-100 ms device "
        "timings 2–10× through the device tunnel (fixed in r4, commits "
        "4e60a99/8ac6b55 — amortized chained timing). Historical rows from "
        "r1–r3 are NOT comparable to r4+ rows; the raw JSONs are kept "
        "immutable.*",
    ]
    lines.append(END)
    return "\n".join(lines)


def splice(path: Path, table: str) -> bool:
    text = path.read_text()
    if START not in text:
        return False
    new = re.sub(
        re.escape(START) + r".*?" + re.escape(END), table, text,
        flags=re.DOTALL,
    )
    path.write_text(new)
    return True


def main() -> None:
    src, d = latest_bench()
    table = build_table(src, d)
    for doc in (ROOT / "README.md", ROOT / "docs" / "PERF.md"):
        if splice(doc, table):
            print(f"updated {doc}")
        else:
            print(f"no {START} marker in {doc} — add one where the metric "
                  f"table should live")


if __name__ == "__main__":
    main()
