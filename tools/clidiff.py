"""
CLI-surface parity: compare click option/argument names per command between
the reference CLI (AST parse of /root/reference/lhotse/bin) and ours
(runtime click introspection). Reports reference flags absent from our
same-named command, per group (prepare/download/top-level/...).

Usage: python tools/clidiff.py [group-filter]
"""
import ast
import sys
from collections import defaultdict
from pathlib import Path

REF_BIN = Path("/root/reference/lhotse/bin")


def ref_commands():
    """(group, command-name) -> set of option/argument names."""
    out = defaultdict(set)
    for py in REF_BIN.rglob("*.py"):
        try:
            tree = ast.parse(py.read_text())
        except SyntaxError:
            continue
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            group = None
            cmd_name = None
            opts = set()
            for dec in node.decorator_list:
                f = dec.func if isinstance(dec, ast.Call) else dec
                attr = f.attr if isinstance(f, ast.Attribute) else None
                owner = (
                    f.value.id
                    if isinstance(f, ast.Attribute) and isinstance(f.value, ast.Name)
                    else None
                )
                if attr == "command":
                    group = owner
                    if isinstance(dec, ast.Call):
                        for kw in dec.keywords:
                            if kw.arg == "name" and isinstance(kw.value, ast.Constant):
                                cmd_name = kw.value.value
                        if dec.args and isinstance(dec.args[0], ast.Constant):
                            cmd_name = dec.args[0].value
                elif attr in ("option", "argument") and isinstance(dec, ast.Call):
                    for a in dec.args:
                        if isinstance(a, ast.Constant) and isinstance(a.value, str):
                            s = a.value
                            if attr == "argument":
                                # click exposes "audio-dir" as param name
                                # "audio_dir"; normalize to match our side.
                                opts.add(s.lower().replace("-", "_"))
                            elif s.startswith("--"):
                                for variant in s.lstrip("-").split("/"):
                                    opts.add("--" + variant.strip("-"))
            if group is not None:
                name = (cmd_name or node.name).replace("_", "-").strip("-")
                out[(group, name)] |= opts
    return out


def our_commands():
    from lhotse_tpu.bin.modes import cli

    out = {}

    def walk(cmd, path):
        import click

        if isinstance(cmd, click.Group):
            for name, sub in cmd.commands.items():
                walk(sub, path + [name])
        else:
            opts = set()
            for p in cmd.params:
                if isinstance(p, click.Option):
                    for o in p.opts + p.secondary_opts:
                        if o.startswith("--"):
                            opts.add(o)
                else:
                    opts.add(p.name.lower())
            group = path[-2] if len(path) >= 2 else "cli"
            out[(group, path[-1])] = opts

    walk(cli, ["cli"])
    return out


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    ref = ref_commands()
    ours = our_commands()
    # group names differ slightly: reference groups prepare/download/cut/...
    our_by_name = defaultdict(dict)
    for (g, n), opts in ours.items():
        our_by_name[n][g] = opts
    n_missing_cmd = n_flagged = n_ok = 0
    for (g, n), ref_opts in sorted(ref.items()):
        if filt and filt not in f"{g}/{n}":
            continue
        cand = our_by_name.get(n)
        if not cand:
            print(f"NO COMMAND: {g}/{n}")
            n_missing_cmd += 1
            continue
        # prefer the same group when present
        our_opts = cand.get(g) or set().union(*cand.values())
        missing = ref_opts - our_opts - {"--help"}
        if missing:
            print(f"{g}/{n}: missing {sorted(missing)}")
            n_flagged += 1
        else:
            n_ok += 1
    print(f"\nok: {n_ok}; flagged: {n_flagged}; absent commands: {n_missing_cmd}")


if __name__ == "__main__":
    main()
