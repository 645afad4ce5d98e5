"""
Regenerate docs/bench-history.md from the driver's BENCH_r*.json records
(plus the judge's manually rerun round-4 numbers, quoted from VERDICT.md).

Run from the repo root:  python tools/gen_bench_history.py
"""
from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Keys worth tracking across rounds -> short column label.
COLUMNS = [
    ("value", "device"),
    ("value_with_wire", "device+wire(int16)"),
    ("value_with_wire_adpcm4", "device+wire(adpcm4)"),
    ("host_pipeline_audio_sec_per_sec", "host ETL"),
    ("e2e_tpu_audio_sec_per_sec", "fresh e2e(int16)"),
    ("e2e_tpu_audio_sec_per_sec_adpcm4", "fresh e2e(adpcm4)"),
    ("e2e_device_busy_frac", "busy frac"),
    ("e2e_cached_audio_sec_per_sec", "HBM-cached e2e"),
    ("precomputed_audio_sec_per_sec", "precomputed"),
]

# The judge reran round 4's bench after the driver record crashed
# (VERDICT.md "Headline judgment" / weak #1); quoted for completeness.
JUDGE_RERUNS = {
    "r4 (judge rerun)": {
        "value": 66179,
        "host_pipeline_audio_sec_per_sec": 1931,
        "e2e_tpu_audio_sec_per_sec": 521,
        "e2e_tpu_audio_sec_per_sec_adpcm4": 1940,
        "e2e_device_busy_frac": 0.085,
        "e2e_cached_audio_sec_per_sec": 13384,
        "precomputed_audio_sec_per_sec": 7016,
    },
}


def load_extra_captures():
    """Builder-captured full runs committed under docs/ (e.g. the round-5
    capture taken before the driver's official run)."""
    extras = {}
    cap = REPO / "docs" / "bench_r5_capture.json"
    if cap.is_file():
        extras["r5 (builder capture)"] = json.loads(cap.read_text())
    return extras


def load_rounds():
    rows = {}
    for p in sorted(REPO.glob("BENCH_r*.json")):
        rec = json.loads(p.read_text())
        name = f"r{rec.get('n', p.stem.split('r')[-1])}"
        parsed = rec.get("parsed")
        if parsed is None:
            rows[name] = None  # crashed record
        else:
            rows[name] = parsed
    rows.update(JUDGE_RERUNS)
    rows.update(load_extra_captures())
    return rows


def fmt(v):
    if v is None:
        return "—"
    if isinstance(v, float) and v < 1:
        return f"{v:.3f}"
    return f"{v:,.0f}"


def main():
    rows = load_rounds()
    lines = [
        "# Bench history",
        "",
        "Per-round captured numbers (audio-s/s unless noted), regenerated from",
        "the driver's `BENCH_r*.json` records by `tools/gen_bench_history.py`",
        "— do not edit the table by hand. A `CRASHED` row means the driver's",
        "record was null (rc != 0) and no numbers exist for that round; the",
        "judge's same-day manual rerun of round 4 is included as its own row.",
        "",
        "| round | " + " | ".join(label for _, label in COLUMNS) + " |",
        "|" + "---|" * (len(COLUMNS) + 1),
    ]
    for name, parsed in rows.items():
        if parsed is None:
            lines.append(f"| {name} | CRASHED " + "| — " * (len(COLUMNS) - 1) + "|")
            continue
        cells = [fmt(parsed.get(key)) for key, _ in COLUMNS]
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
    lines += [
        "",
        "Methodology changes: r5 switched the host/cached/precomputed legs to",
        "median-of-3 windows (>=8 s each) after warmup passes (two on the",
        "host leg: the post-transform window cache reaches steady state at",
        "epoch 3), and made every",
        "section crash-isolated with retries (see bench.py docstring).",
        "",
    ]
    out = REPO / "docs" / "bench-history.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
