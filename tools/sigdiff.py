"""
Signature-level parity sweep: for every public function/method name shared
with the reference, report reference parameters that have no same-named
parameter in any of our same-named callables. Static AST parse on both sides
(the reference can't be imported in-env).

High false-positive tolerance by design — output is a review worklist, not a
test. Usage: python tools/sigdiff.py [name-substring-filter]
"""
import ast
import sys
from collections import defaultdict
from pathlib import Path

REF = Path("/root/reference/lhotse")
OURS = Path(__file__).resolve().parent.parent / "lhotse_tpu"

# Params that are torch/env-specific on the reference side, or renamed
# project-wide; never report these.
IGNORED_PARAMS = {
    "self", "cls", "args", "kwargs",
    # torch plumbing
    "device", "pin_memory", "generator", "worker_init_fn", "persistent_workers",
    "prefetch_factor", "multiprocessing_context", "collate_fn", "sampler",
    "batch_sampler", "timeout_ms",
}


def collect(root: Path):
    """name -> list of (file, param-name set) for public defs (top level and
    class methods)."""
    out = defaultdict(list)
    for py in root.rglob("*.py"):
        if "test" in py.parts or (py.name.startswith("_") and py.name != "__init__.py"):
            continue
        try:
            tree = ast.parse(py.read_text(), filename=str(py))
        except SyntaxError:
            continue

        def visit(node, prefix=""):
            for child in ast.iter_child_nodes(node):
                if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    if child.name.startswith("_") and child.name != "__init__":
                        continue
                    a = child.args
                    params = {p.arg for p in a.posonlyargs + a.args + a.kwonlyargs}
                    if a.vararg:
                        params.add("*")
                    if a.kwarg:
                        params.add("**")
                    key = f"{prefix}{child.name}" if child.name != "__init__" else f"{prefix[:-1]}"
                    out[key].append((str(py.relative_to(root)), params))
                elif isinstance(child, ast.ClassDef):
                    visit(child, prefix=f"{child.name}.")

        visit(tree)
    return out


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    ref = collect(REF)
    ours = collect(OURS)
    n_shared = n_flagged = 0
    for name in sorted(ref):
        if filt and filt not in name:
            continue
        if name not in ours:
            continue
        n_shared += 1
        ref_params = set().union(*(p for _, p in ref[name]))
        our_params = set().union(*(p for _, p in ours[name]))
        # Our CLI splits download commands into `<name>_dl` where the
        # reference reuses one function name across click groups.
        if f"{name}_dl" in ours:
            our_params |= set().union(*(p for _, p in ours[f"{name}_dl"]))
        if "**" in our_params:
            continue  # our side accepts arbitrary kwargs
        missing = ref_params - our_params - IGNORED_PARAMS - {"*", "**"}
        if missing:
            n_flagged += 1
            ref_files = ",".join(sorted({f for f, _ in ref[name]}))
            print(f"{name}  missing params: {sorted(missing)}  (ref: {ref_files})")
    print(f"\nshared callables: {n_shared}; flagged: {n_flagged}")


if __name__ == "__main__":
    main()
