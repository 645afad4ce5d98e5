"""
Measure normalized-line similarity between repo files and their reference
counterparts (the same metric the round-1 review used): strip comments,
docstrings and blank lines, normalize whitespace, then count the fraction of
repo lines that also appear in the reference file (multiset intersection),
plus the longest runs of consecutive matching lines.

Usage:
    python tools/simcheck.py lhotse_tpu/lazy.py /root/reference/lhotse/lazy.py
    python tools/simcheck.py --all          # check the known mapping table
"""
from __future__ import annotations

import io
import sys
import tokenize
from collections import Counter
from pathlib import Path

# repo path -> reference path (the files flagged in VERDICT.md round 1)
MAPPING = {
    "lhotse_tpu/dataset/sampling/dynamic_bucketing.py": "lhotse/dataset/sampling/dynamic_bucketing.py",
    "lhotse_tpu/cut/set.py": "lhotse/cut/set.py",
    "lhotse_tpu/kaldi.py": "lhotse/kaldi.py",
    "lhotse_tpu/lazy.py": "lhotse/lazy.py",
    "lhotse_tpu/cut/mixed.py": "lhotse/cut/mixed.py",
    "lhotse_tpu/packed_lazy.py": "lhotse/packed_lazy.py",
    "lhotse_tpu/shar/readers/indexed.py": "lhotse/shar/readers/indexed.py",
    "lhotse_tpu/dataset/sampling/checkpoint_backends.py": "lhotse/dataset/sampling/checkpoint_backends.py",
    "lhotse_tpu/testing/fixtures.py": "lhotse/testing/fixtures.py",
    "lhotse_tpu/testing/dummies.py": "lhotse/testing/dummies.py",
    "lhotse_tpu/recipes/librispeech.py": "lhotse/recipes/librispeech.py",
    "lhotse_tpu/cut/describe.py": "lhotse/cut/describe.py",
    "lhotse_tpu/dataset/sampling/base.py": "lhotse/dataset/sampling/base.py",
    "lhotse_tpu/audio/recording.py": "lhotse/audio/recording.py",
    "lhotse_tpu/index_pack.py": "lhotse/index_pack.py",
    "lhotse_tpu/cut/data.py": "lhotse/cut/data.py",
}

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")


def normalized_lines(path: Path) -> list[str]:
    src = path.read_text()
    # Remove comments and docstrings via tokenize; fall back to raw on error.
    try:
        out_tokens = []
        prev_end = (1, 0)
        result = []
        toks = list(tokenize.generate_tokens(io.StringIO(src).readline))
        drop_strings = set()
        # Identify docstrings: STRING tokens that are the first statement of a
        # module/class/function body (heuristic: STRING at statement start).
        for i, tok in enumerate(toks):
            if tok.type == tokenize.COMMENT:
                drop_strings.add(i)
            elif tok.type == tokenize.STRING:
                # statement-level string == docstring-ish; drop it
                j = i - 1
                while j >= 0 and toks[j].type in (
                    tokenize.NL,
                    tokenize.NEWLINE,
                    tokenize.INDENT,
                    tokenize.DEDENT,
                    tokenize.COMMENT,
                    tokenize.ENCODING,
                ):
                    j -= 1
                if j < 0 or toks[j].exact_type in (
                    tokenize.NEWLINE,
                    tokenize.INDENT,
                ):
                    drop_strings.add(i)
        kept = [t for i, t in enumerate(toks) if i not in drop_strings]
        lines = {}
        for t in kept:
            if t.type in (
                tokenize.NL,
                tokenize.NEWLINE,
                tokenize.INDENT,
                tokenize.DEDENT,
                tokenize.ENCODING,
                tokenize.ENDMARKER,
            ):
                continue
            lines.setdefault(t.start[0], []).append(t.string)
        result = [" ".join(parts) for _, parts in sorted(lines.items())]
        return [ln for ln in (" ".join(r.split()) for r in result) if ln]
    except Exception:
        return [
            " ".join(ln.split())
            for ln in src.splitlines()
            if ln.strip() and not ln.strip().startswith("#")
        ]


def longest_runs(a: list[str], b: list[str], min_run: int = 15):
    """Find runs of >=min_run consecutive lines of `a` appearing consecutively in `b`."""
    pos = {}
    for j, ln in enumerate(b):
        pos.setdefault(ln, []).append(j)
    runs = []
    i = 0
    while i < len(a):
        best = 0
        for j in pos.get(a[i], []):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
        if best >= min_run:
            runs.append((i + 1, best))
            i += best
        else:
            i += 1
    return runs


def check(repo_file: Path, ref_file: Path) -> tuple[float, list]:
    a = normalized_lines(repo_file)
    b = normalized_lines(ref_file)
    if not a:
        return 0.0, []
    ca, cb = Counter(a), Counter(b)
    inter = sum(min(ca[k], cb[k]) for k in ca)
    return inter / len(a), longest_runs(a, b)


def sweep(threshold: float = 0.55, min_lines: int = 60):
    """Auto-map every lhotse_tpu/**.py to lhotse/<same relative path> and
    report files above the similarity threshold, worst first."""
    rows = []
    for rp in sorted((REPO / "lhotse_tpu").rglob("*.py")):
        rel = rp.relative_to(REPO / "lhotse_tpu")
        fp = REF / "lhotse" / rel
        if not fp.exists():
            continue
        lines = normalized_lines(rp)
        if len(lines) < min_lines:
            continue
        sim, runs = check(rp, fp)
        rows.append((sim, str(rp.relative_to(REPO)), len(lines), len(runs)))
    rows.sort(reverse=True)
    for sim, rel, n, runs in rows:
        if sim < threshold:
            break
        print(f"{sim:5.1%}  {rel}  ({n} lines, runs>=15: {runs})")
    above = sum(1 for r in rows if r[0] >= threshold)
    print(f"{above} files >= {threshold:.0%} (of {len(rows)} mapped files)")


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--sweep":
        sweep()
        return
    if len(sys.argv) == 3 and sys.argv[1] == "--sweep":
        sweep(threshold=float(sys.argv[2]))
        return
    if len(sys.argv) == 3:
        sim, runs = check(Path(sys.argv[1]), Path(sys.argv[2]))
        print(f"{sim:.1%}  runs>=15: {runs}")
        return
    worst = 0.0
    for repo_rel, ref_rel in MAPPING.items():
        rp, fp = REPO / repo_rel, REF / ref_rel
        if not rp.exists():
            print(f"{repo_rel}: MISSING")
            continue
        sim, runs = check(rp, fp)
        worst = max(worst, sim)
        flag = " <-- HIGH" if sim > 0.40 else ""
        print(f"{sim:5.1%}  {repo_rel}  runs>=15: {len(runs)}{flag}")
    print(f"worst: {worst:.1%}")


if __name__ == "__main__":
    main()
