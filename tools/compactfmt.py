"""House-style formatter: collapse multi-line parenthesized groups that fit
within the column limit into a single line.

The repo's style packs call/signature argument lists onto one line whenever
they fit in ``LIMIT`` columns (we do not use black's magic trailing comma).
This tool enforces that style mechanically:

- find every paren/bracket/brace group that spans multiple physical lines,
- if its contents hold no comments and no multi-line string tokens, and the
  joined form fits in the limit, rewrite it onto one line (dropping a
  redundant trailing comma),
- verify each rewrite by comparing ``ast.dump`` of the whole file before and
  after; any change in semantics (e.g. a 1-tuple losing its comma) rolls the
  group back.

Usage:
    python tools/compactfmt.py FILE [FILE...]
    python tools/compactfmt.py --check FILE   # exit 1 if changes needed
"""
from __future__ import annotations

import ast
import io
import sys
import tokenize
from pathlib import Path

LIMIT = 100
OPEN = {"(": ")", "[": "]", "{": "}"}


def _groups(src: str):
    """Yield (start, end) token positions of bracket groups, innermost last."""
    stack = []
    out = []
    try:
        toks = list(tokenize.generate_tokens(io.StringIO(src).readline))
    except tokenize.TokenError:
        return []
    for tok in toks:
        if tok.type == tokenize.OP and tok.string in OPEN:
            stack.append(tok)
        elif tok.type == tokenize.OP and tok.string in OPEN.values():
            if stack:
                op = stack.pop()
                out.append((op.start, tok.end, _has_blocker(toks, op, tok)))
    return out


def _has_blocker(toks, op, close) -> bool:
    """True if the span contains a comment or a token spanning lines."""
    for t in toks:
        if t.start < op.start or t.end > close.end:
            continue
        if t.type == tokenize.COMMENT:
            return True
        if t.start[0] != t.end[0] and t.type not in (
            tokenize.NL,
            tokenize.NEWLINE,
        ):
            return True
    return False


def _split_top_commas(mid: str) -> list[str] | None:
    """Split a single-line fragment at depth-0 commas (tokenizer-driven)."""
    try:
        toks = list(tokenize.generate_tokens(io.StringIO(mid).readline))
    except tokenize.TokenError:
        return None
    depth = 0
    cuts = []
    for t in toks:
        if t.type != tokenize.OP:
            continue
        if t.string in OPEN:
            depth += 1
        elif t.string in OPEN.values():
            depth -= 1
        elif t.string == "," and depth == 0:
            cuts.append(t.start[1])
    parts = []
    prev = 0
    for c in cuts:
        parts.append(mid[prev:c].strip())
        prev = c + 1
    parts.append(mid[prev:].strip())
    return [p for p in parts if p]


def _collapse_one(lines: list[str], start, end) -> list[str] | None:
    (r1, c1), (r2, c2) = start, end
    r1 -= 1
    r2 -= 1
    if r1 == r2:
        return None
    head = lines[r1][: c1 + 1]
    tail = lines[r2][c2 - 1 :]
    mid_parts = [lines[r1][c1 + 1 :].strip()]
    for r in range(r1 + 1, r2):
        mid_parts.append(lines[r].strip())
    mid_parts.append(lines[r2][: c2 - 1].strip())
    mid = " ".join(p for p in mid_parts if p)
    elems = _split_top_commas(mid)
    # drop the trailing comma left over from the exploded layout — but never
    # on a 1-element group, where it may be a 1-tuple's significant comma
    if mid.endswith(",") and elems and len(elems) >= 2:
        mid = mid[:-1]
    new_line = head + mid + tail
    if len(new_line) <= LIMIT:
        return lines[:r1] + [new_line] + lines[r2 + 1 :]
    # Fill mode: pack the comma-separated elements onto as few lines as fit.
    if not elems or len(elems) < 2:
        return None
    base_indent = lines[r1][: len(lines[r1]) - len(lines[r1].lstrip())]
    indent = base_indent + "    "
    packed: list[str] = []
    cur = ""
    for i, e in enumerate(elems):
        candidate = (cur + " " + e + ",") if cur else (indent + e + ",")
        if cur and len(candidate) > LIMIT:
            packed.append(cur)
            cur = indent + e + ","
        else:
            cur = candidate
    if cur:
        packed.append(cur)
    # house style: the closing bracket hugs the last element when it fits
    # (safe to drop the trailing comma: fill mode requires >= 2 elements)
    if packed and len(packed[-1].rstrip(",") + tail.strip()) <= LIMIT:
        packed[-1] = packed[-1].rstrip(",") + tail.strip()
        new_block = [head] + packed
    else:
        new_block = [head] + packed + [base_indent + tail.strip()]
    if new_block == lines[r1 : r2 + 1]:
        return None
    return lines[:r1] + new_block + lines[r2 + 1 :]


def format_source(src: str) -> str:
    try:
        ref_dump = ast.dump(ast.parse(src))
    except SyntaxError:
        return src
    for _round in range(32):
        lines = src.splitlines(keepends=False)
        # pick non-overlapping multi-line groups, outermost-first
        picked = []
        last_end = (0, 0)
        for start, end, blocked in sorted(_groups(src)):
            if blocked or start[0] == end[0]:
                continue
            if start < last_end:  # nested inside an already-picked group
                continue
            picked.append((start, end))
            last_end = end
        if not picked:
            break
        # apply bottom-up so earlier positions stay valid
        new_lines = lines
        applied = 0
        for start, end in reversed(picked):
            res = _collapse_one(new_lines, start, end)
            if res is not None:
                new_lines = res
                applied += 1
        if not applied:
            break
        candidate = "\n".join(new_lines)
        if src.endswith("\n"):
            candidate += "\n"
        ok = False
        try:
            ok = ast.dump(ast.parse(candidate)) == ref_dump
        except SyntaxError:
            ok = False
        if ok:
            if candidate == src:
                break
            src = candidate
            continue
        # batch failed the AST check: fall back to one-at-a-time this round
        progressed = False
        for start, end in reversed(picked):
            lines = src.splitlines(keepends=False)
            res = _collapse_one(lines, start, end)
            if res is None:
                continue
            candidate = "\n".join(res)
            if src.endswith("\n"):
                candidate += "\n"
            try:
                if ast.dump(ast.parse(candidate)) == ref_dump:
                    src = candidate
                    progressed = True
            except SyntaxError:
                pass
        if not progressed:
            break
    return src


def main(argv: list[str]) -> int:
    check = "--check" in argv
    files = [a for a in argv if not a.startswith("--")]
    dirty = 0
    for f in files:
        p = Path(f)
        src = p.read_text()
        new = format_source(src)
        if new != src:
            dirty += 1
            if check:
                print(f"would reformat {f}")
            else:
                p.write_text(new)
                print(f"reformatted {f}")
    return 1 if (check and dirty) else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
