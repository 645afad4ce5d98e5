"""
Manifest manipulation commands: copy, split, subset, combine, filter, ...

Reference behavior: `/root/reference/lhotse/bin/modes/manipulation.py`
(copy :25-32, copy_feats :58-127, split :154-178, split_lazy :194-215,
subset :233-263, combine :271-276, filter :285-350).
"""
import json
import os
from concurrent.futures import ProcessPoolExecutor, as_completed
from itertools import groupby
from pathlib import Path
from typing import Optional

import click

from lhotse_tpu import FeatureSet, available_storage_backends
from lhotse_tpu.bin.modes.cli_base import cli
from lhotse_tpu.cut import CutSet
from lhotse_tpu.features.io import default_features_storage_backend_name, get_writer
from lhotse_tpu.serialization import load_manifest_lazy_or_eager
from lhotse_tpu.utils import Pathlike

__all__ = ["split", "combine", "subset", "filter"]


@cli.command()
@click.argument(
    "input_manifest", type=click.Path(exists=True, dir_okay=False, allow_dash=True)
)
@click.argument("output_manifest", type=click.Path(allow_dash=True))
def copy(input_manifest, output_manifest):
    """
    Load INPUT_MANIFEST and store it to OUTPUT_MANIFEST — converts between
    serialization formats (JSON/JSONL/YAML, with .gz compression).
    """
    data = load_manifest_lazy_or_eager(input_manifest)
    data.to_file(output_manifest)


@cli.command()
@click.argument(
    "input_manifest", type=click.Path(exists=True, dir_okay=False, allow_dash=True)
)
@click.argument("output_manifest", type=click.Path(allow_dash=True))
@click.argument("storage_path", type=str)
@click.option(
    "-t",
    "--storage-type",
    type=click.Choice(available_storage_backends()),
    default=default_features_storage_backend_name(),
    help="Storage backend for writing the copied features.",
)
@click.option(
    "-j",
    "--max-jobs",
    default=-1,
    type=int,
    help="Maximum number of parallel copying processes (default: one per "
    "existing feature file).",
)
def copy_feats(
    input_manifest: Pathlike,
    output_manifest: Pathlike,
    storage_path: str,
    storage_type: str,
    max_jobs: int,
) -> None:
    """
    Read every feature matrix from INPUT_MANIFEST (FeatureSet or CutSet),
    save them in STORAGE_PATH, and write the updated OUTPUT_MANIFEST.
    """
    from lhotse_tpu.manipulation import combine as combine_manifests

    manifests = load_manifest_lazy_or_eager(input_manifest)

    if isinstance(manifests, FeatureSet):
        with get_writer(storage_type)(storage_path) as w:
            manifests = manifests.copy_feats(writer=w)
            manifests.to_file(output_manifest)

    elif isinstance(manifests, CutSet):
        # Group cuts by their underlying feature files for parallel copy.
        manifests = sorted(manifests, key=lambda cut: cut.features.storage_path)
        subsets = groupby(manifests, lambda cut: cut.features.storage_path)
        unique_storage_paths, subsets = zip(
            *[(k, CutSet.from_cuts(grp)) for k, grp in subsets]
        )

        tot_items = len(unique_storage_paths)
        new_storage_paths = [f"{storage_path}/feats-{i}" for i in range(tot_items)]
        partial_manifest_paths = [
            f"{storage_path}/cuts-{i}.jsonl.gz" for i in range(tot_items)
        ]

        num_jobs = len(unique_storage_paths)
        if max_jobs > 0:
            num_jobs = min(num_jobs, max_jobs)

        if Path(storage_path).parent.is_dir():
            Path(storage_path).mkdir(exist_ok=True)

        with ProcessPoolExecutor(num_jobs) as ex:
            futures = []
            for cs, nsp, pmp in zip(subsets, new_storage_paths, partial_manifest_paths):
                futures.append(ex.submit(copy_feats_worker, cs, nsp, storage_type, pmp))

            all_cuts = combine_manifests((f.result() for f in as_completed(futures)))

        with CutSet.open_writer(output_manifest) as w:
            for c in all_cuts:
                w.write(c)
    else:
        raise ValueError(
            f"Unsupported manifest type ({type(manifests)}) at: {input_manifest}"
        )


def copy_feats_worker(
    cuts: CutSet, storage_path: Pathlike, storage_type: str, output_manifest: Path
) -> CutSet:
    with get_writer(storage_type)(storage_path) as w:
        return cuts.copy_feats(writer=w, output_path=output_manifest)


@cli.command()
@click.argument("num_splits", type=int)
@click.argument("manifest", type=click.Path(exists=True, dir_okay=False, allow_dash=True))
@click.argument("output_dir", type=click.Path())
@click.option(
    "-s", "--shuffle", is_flag=True, help="Optionally shuffle the sequence before splitting."
)
@click.option(
    "--pad/--no-pad",
    default=True,
    help="Pad the split output idx with zeros (e.g. 00, 01, 02, .., 10).",
)
@click.option(
    "-i", "--start-idx", type=int, default=0, help="Count splits starting from this index."
)
def split(
    num_splits: int,
    manifest: Pathlike,
    output_dir: Pathlike,
    shuffle: bool,
    pad: bool,
    start_idx: int,
):
    """
    Split MANIFEST into NUM_SPLITS equal parts saved in OUTPUT_DIR.
    For very large manifests, prefer "lhotse-tpu split-lazy".
    """
    output_dir = Path(output_dir)
    manifest = Path(manifest)
    suffix = "".join(manifest.suffixes)
    any_set = load_manifest_lazy_or_eager(manifest)
    parts = any_set.split(num_splits=num_splits, shuffle=shuffle)
    output_dir.mkdir(parents=True, exist_ok=True)
    num_digits = len(str(num_splits))
    for idx, part in enumerate(parts, start=start_idx):
        idx = f"{idx}".zfill(num_digits) if pad else str(idx)
        part.to_file((output_dir / manifest.stem).with_suffix(f".{idx}{suffix}"))


@cli.command()
@click.argument("manifest", type=click.Path(exists=True, dir_okay=False, allow_dash=True))
@click.argument("output_dir", type=click.Path(allow_dash=True))
@click.argument("chunk_size", type=int)
@click.option(
    "-i", "--start-idx", type=int, default=0, help="Count splits starting from this index."
)
def split_lazy(manifest: Pathlike, output_dir: Pathlike, chunk_size: int, start_idx: int):
    """
    Split MANIFEST lazily into parts of CHUNK_SIZE items saved as
    "{output_dir}/{manifest.stem}.{chunk_idx}.jsonl.gz".
    """
    output_dir = Path(output_dir)
    manifest = Path(manifest)
    any_set = load_manifest_lazy_or_eager(manifest)
    any_set.split_lazy(
        output_dir=output_dir,
        chunk_size=chunk_size,
        prefix=manifest.stem,
        start_idx=start_idx,
    )


@cli.command()
@click.argument("manifest", type=click.Path(exists=True, dir_okay=False, allow_dash=True))
@click.argument("output_manifest", type=click.Path(allow_dash=True))
@click.option("--first", type=int)
@click.option("--last", type=int)
@click.option(
    "--cutids",
    type=str,
    help=(
        "A json string or path to json file containing array of cutids strings. "
        'E.g. --cutids \'["cutid1", "cutid2"]\'.'
    ),
)
def subset(
    manifest: Pathlike,
    output_manifest: Pathlike,
    first: Optional[int],
    last: Optional[int],
    cutids: Optional[str],
):
    """Select the FIRST or LAST items of MANIFEST into OUTPUT_MANIFEST."""
    output_manifest = Path(output_manifest)
    manifest = Path(manifest)
    any_set = load_manifest_lazy_or_eager(manifest)

    cids = None
    if cutids is not None:
        if os.path.exists(cutids):
            with open(cutids, "rt") as r:
                cids = json.load(r)
        else:
            cids = json.loads(cutids)

    if isinstance(any_set, CutSet):
        a_subset = any_set.subset(first=first, last=last, cut_ids=cids)
    else:
        if cutids is not None:
            raise ValueError(
                f"Expected a CutSet manifest with cut_ids argument; got {type(any_set)}"
            )
        a_subset = any_set.subset(first=first, last=last)

    a_subset.to_file(output_manifest)


@cli.command()
@click.argument(
    "manifests", nargs=-1, type=click.Path(exists=True, dir_okay=False, allow_dash=True)
)
@click.argument("output_manifest", type=click.Path(allow_dash=True))
def combine(manifests: Pathlike, output_manifest: Pathlike):
    """Combine MANIFESTS into a single one written to OUTPUT_MANIFEST."""
    from lhotse_tpu.manipulation import combine as combine_manifests

    data_set = combine_manifests(*[load_manifest_lazy_or_eager(m) for m in manifests])
    data_set.to_file(output_manifest)


@cli.command()
@click.argument("predicate")
@click.argument("manifest", type=click.Path(exists=True, dir_okay=False, allow_dash=True))
@click.argument("output_manifest", type=click.Path(allow_dash=True))
def filter(predicate: str, manifest: Pathlike, output_manifest: Pathlike):
    """
    Filter a MANIFEST by PREDICATE into OUTPUT_MANIFEST. Works with
    RecordingSet, SupervisionSet and CutSet.

    \b
    PREDICATE compares a numeric attribute, e.g.:
    lhotse-tpu filter 'duration>4.5' supervision.json output.json
    lhotse-tpu filter 'num_frames<600' cuts.json output.json
    """
    import operator
    import re
    from math import isclose

    from lhotse_tpu.manipulation import to_manifest

    data_set = load_manifest_lazy_or_eager(manifest)

    predicate_pattern = re.compile(
        r"(?P<key>\w+)(?P<op>=|==|!=|>|<|>=|<=)(?P<value>[0-9.]+)"
    )
    match = predicate_pattern.match(predicate)
    if match is None:
        raise ValueError(
            "Invalid predicate! Run with --help option to learn what "
            "predicates are allowed."
        )

    compare = {
        "<": operator.lt,
        ">": operator.gt,
        ">=": operator.ge,
        "<=": operator.le,
        "=": isclose,
        "==": isclose,
        "!=": lambda a, b: not isclose(a, b),
    }[match.group("op")]
    try:
        value = int(match.group("value"))
    except ValueError:
        value = float(match.group("value"))

    retained_items = []
    try:
        for item in data_set:
            attr = getattr(item, match.group("key"))
            if compare(attr, value):
                retained_items.append(item)
    except AttributeError:
        click.echo(
            f'Invalid predicate! Items in "{manifest}" do not have the '
            f'attribute "{match.group("key")}"',
            err=True,
        )
        exit(1)

    filtered_data_set = to_manifest(retained_items)
    if filtered_data_set is None:
        click.echo("No items satisfying the predicate.", err=True)
        exit(0)
    filtered_data_set.to_file(output_manifest)
