"""
CutSet creation and manipulation commands.

Reference behavior: `/root/reference/lhotse/bin/modes/cut.py`
(simple :44-85, trim_to_supervisions :125-147, trim_to_alignments :176-203,
trim_to_supervision_groups :215-231, mix_sequential :237-247,
mix_by_recording_id :253-267, truncate :302-321, append :327-341, pad
:358-367, decompose :373-384, describe :389-393, estimate_bucket_bins
:491-504).
"""
from collections import defaultdict
from pathlib import Path
from typing import List, Optional

import click

from lhotse_tpu.bin.modes.cli_base import cli
from lhotse_tpu.cut import CutSet, append_cuts, mix_cuts
from lhotse_tpu.serialization import load_manifest_lazy_or_eager
from lhotse_tpu.utils import Pathlike


@cli.group()
def cut():
    """Group of commands used to create CutSets."""
    pass


@cut.command()
@click.argument("output_cut_manifest", type=click.Path(allow_dash=True))
@click.option(
    "-r",
    "--recording-manifest",
    type=click.Path(exists=True, dir_okay=False),
    help="Optional recording manifest to attach recordings to the cuts.",
)
@click.option(
    "-f",
    "--feature-manifest",
    type=click.Path(exists=True, dir_okay=False),
    help="Optional feature manifest to attach features to the cuts.",
)
@click.option(
    "-s",
    "--supervision-manifest",
    type=click.Path(exists=True, dir_okay=False),
    help="Optional supervision manifest to attach supervisions to the cuts.",
)
@click.option(
    "--force-eager",
    is_flag=True,
    help="Read full manifests into memory first (required when the inputs "
    "are not sorted by recording ID).",
)
def simple(
    output_cut_manifest: Pathlike,
    recording_manifest: Optional[Pathlike],
    feature_manifest: Optional[Pathlike],
    supervision_manifest: Optional[Pathlike],
    force_eager: bool,
):
    """
    Create a CutSet in OUTPUT_CUT_MANIFEST from any combination of
    recording/feature/supervision manifests (at least one of
    recording/feature required).
    """
    supervision_set, feature_set, recording_set = [
        load_manifest_lazy_or_eager(p) if p is not None else None
        for p in (supervision_manifest, feature_manifest, recording_manifest)
    ]

    if (
        all(m is None or m.is_lazy for m in (supervision_set, feature_set, recording_set))
        and not force_eager
    ):
        CutSet.from_manifests(
            recordings=recording_set,
            supervisions=supervision_set,
            features=feature_set,
            output_path=output_cut_manifest,
            lazy=True,
        )
    else:
        cut_set = CutSet.from_manifests(
            recordings=recording_set,
            supervisions=supervision_set,
            features=feature_set,
        )
        cut_set.to_file(output_cut_manifest)


@cut.command()
@click.argument("cuts", type=click.Path(exists=True, dir_okay=False, allow_dash=True))
@click.argument("output_cuts", type=click.Path(allow_dash=True))
@click.option(
    "--keep-overlapping/--discard-overlapping",
    type=bool,
    default=True,
    help="When False, discard parts of other supervisions that overlap with "
    "the main supervision.",
)
@click.option(
    "-d",
    "--min-duration",
    type=float,
    default=None,
    help="Extend cuts shorter than this with acoustic context.",
)
@click.option(
    "-c",
    "--context-direction",
    type=click.Choice(["center", "left", "right", "random"]),
    default="center",
    help="Which direction to expand towards to include context.",
)
def trim_to_supervisions(
    cuts: Pathlike,
    output_cuts: Pathlike,
    keep_overlapping: bool,
    min_duration: Optional[float],
    context_direction: str,
):
    """
    Split each input cut into one cut per supervision, spanning exactly the
    supervision's time span.
    """
    cuts = CutSet.from_file(cuts)

    with CutSet.open_writer(output_cuts) as writer:
        for c in cuts.trim_to_supervisions(
            keep_overlapping=keep_overlapping,
            min_duration=min_duration,
            context_direction=context_direction,
        ):
            writer.write(c)


@cut.command()
@click.argument("cuts", type=click.Path(exists=True, dir_okay=False, allow_dash=True))
@click.argument("output_cuts", type=click.Path(allow_dash=True))
@click.option("--type", type=str, default="word", help="Alignment type to use for trimming")
@click.option(
    "--max-pause",
    type=float,
    default=0.0,
    help="Merge alignments separated by a pause shorter than this value",
)
@click.option(
    "--delimiter",
    "-d",
    type=str,
    default=" ",
    help="Delimiter to use for concatenating alignment symbols for merging",
)
def trim_to_alignments(
    cuts: Pathlike,
    output_cuts: Pathlike,
    type: str,
    max_pause: float,
    delimiter: str,
):
    """
    New CutSet with cuts spanning the alignments of type TYPE; contiguous
    alignment items within MAX_PAUSE are merged.
    """
    cuts = CutSet.from_file(cuts)

    with CutSet.open_writer(output_cuts) as writer:
        for c in cuts.trim_to_alignments(
            type=type, max_pause=max_pause, delimiter=delimiter
        ):
            writer.write(c)


@cut.command()
@click.argument("cuts", type=click.Path(exists=True, dir_okay=False, allow_dash=True))
@click.argument("output_cuts", type=click.Path(allow_dash=True))
@click.option(
    "--max-pause",
    type=float,
    default=0.0,
    help="Merge supervision groups separated by a pause shorter than this value",
)
def trim_to_supervision_groups(
    cuts: Pathlike,
    output_cuts: Pathlike,
    max_pause: float,
):
    """
    New CutSet with cuts spanning supervision groups (supervisions that
    overlap or are separated by less than MAX_PAUSE).
    """
    cuts = CutSet.from_file(cuts)

    with CutSet.open_writer(output_cuts) as writer:
        for c in cuts.trim_to_supervision_groups(max_pause=max_pause):
            writer.write(c)


@cut.command()
@click.argument("cut_manifests", nargs=-1, type=click.Path(exists=True, dir_okay=False))
@click.argument("output_cut_manifest", type=click.Path())
def mix_sequential(cut_manifests: List[Pathlike], output_cut_manifest: Pathlike):
    """
    Mix cuts position-wise across CUT_MANIFESTS (first with first, etc.),
    stopping at the shortest manifest.
    """
    cut_manifests = [CutSet.from_file(path) for path in cut_manifests]
    with CutSet.open_writer(output_cut_manifest) as w:
        for cuts in zip(*cut_manifests):
            w.write(mix_cuts(cuts))


@cut.command()
@click.argument("cut_manifests", nargs=-1, type=click.Path(exists=True, dir_okay=False))
@click.argument("output_cut_manifest", type=click.Path())
def mix_by_recording_id(cut_manifests: List[Pathlike], output_cut_manifest: Pathlike):
    """
    Mix cuts from CUT_MANIFESTS matched by their recording IDs.
    """
    from lhotse_tpu.manipulation import combine

    all_cuts = combine(*[CutSet.from_file(path) for path in cut_manifests])
    recording_id_to_cuts = defaultdict(list)
    for c in all_cuts:
        recording_id_to_cuts[c.recording_id].append(c)
    mixed_cut_set = CutSet.from_cuts(
        mix_cuts(cuts) for recording_id, cuts in recording_id_to_cuts.items()
    )
    mixed_cut_set.to_file(output_cut_manifest)


@cut.command(context_settings=dict(show_default=True))
@click.argument("cut_manifest", type=click.Path(exists=True, dir_okay=False, allow_dash=True))
@click.argument("output_cut_manifest", type=click.Path(allow_dash=True))
@click.option(
    "--preserve-id",
    is_flag=True,
    help="Should the cuts preserve IDs (by default, they will get new, random IDs)",
)
@click.option(
    "-d",
    "--max-duration",
    type=float,
    required=True,
    help="The maximum duration in seconds of a cut in the resulting manifest.",
)
@click.option(
    "-o",
    "--offset-type",
    type=click.Choice(["start", "end", "random"]),
    default="start",
    help="Where the truncated cut starts relative to the original.",
)
@click.option(
    "--keep-overflowing-supervisions/--discard-overflowing-supervisions",
    type=bool,
    default=False,
    help="Keep supervisions cut in the middle by the truncation.",
)
def truncate(
    cut_manifest: Pathlike,
    output_cut_manifest: Pathlike,
    preserve_id: bool,
    max_duration: float,
    offset_type: str,
    keep_overflowing_supervisions: bool,
):
    """
    Truncate cuts to MAX_DURATION (shorter cuts are unmodified).
    """
    cut_set = CutSet.from_file(cut_manifest)
    truncated_cut_set = cut_set.truncate(
        max_duration=max_duration,
        offset_type=offset_type,
        keep_excessive_supervisions=keep_overflowing_supervisions,
        preserve_id=preserve_id,
    )
    truncated_cut_set.to_file(output_cut_manifest)


@cut.command()
@click.argument("cut_manifests", nargs=-1, type=click.Path(exists=True, dir_okay=False))
@click.argument("output_cut_manifest", type=click.Path())
def append(
    cut_manifests: List[Pathlike],
    output_cut_manifest: Pathlike,
):
    """
    Append cuts position-wise across CUT_MANIFESTS, in argument order,
    stopping at the shortest manifest.
    """
    cut_sets = [CutSet.from_file(path) for path in cut_manifests]
    with CutSet.open_writer(output_cut_manifest) as w:
        for cuts in zip(*cut_sets):
            w.write(append_cuts(cuts))


@cut.command()
@click.argument("cut_manifest", type=click.Path(exists=True, dir_okay=False, allow_dash=True))
@click.argument("output_cut_manifest", type=click.Path(allow_dash=True))
@click.option(
    "-d",
    "--duration",
    default=None,
    type=float,
    help="Desired duration after right-padding (default: the longest cut).",
)
def pad(cut_manifest: Pathlike, output_cut_manifest: Pathlike, duration: Optional[float]):
    """
    Right-pad the cuts in CUT_MANIFEST.
    """
    cut_set = CutSet.from_file(cut_manifest)
    padded_cut_set = cut_set.pad(duration=duration)
    padded_cut_set.to_file(output_cut_manifest)


@cut.command()
@click.argument("cutset", type=click.Path(exists=True, dir_okay=False, allow_dash=True))
@click.argument("output", type=click.Path())
def decompose(cutset: Pathlike, output: Pathlike):
    """
    \b
    Decompose CUTSET into:
        * recording set (recordings.jsonl.gz)
        * feature set (features.jsonl.gz)
        * supervision set (supervisions.jsonl.gz)
    """
    CutSet.from_file(cutset).decompose(output_dir=Path(output), verbose=True)


@cut.command()
@click.argument("cutset", type=click.Path(exists=True, dir_okay=False, allow_dash=True))
def describe(cutset: Pathlike):
    """
    Describe statistics of CUTSET (total speech/audio duration etc.).
    """
    CutSet.from_file(cutset).describe()


@cut.command()
@click.argument("cutset", type=click.Path(exists=True, dir_okay=False, allow_dash=True))
@click.option("-b", "--num-buckets", default=30, type=int, help="Desired number of buckets.")
@click.option(
    "-s",
    "--sample",
    default=None,
    type=int,
    help="How many samples to use for estimation (default: full cutset).",
)
def estimate_bucket_bins(cutset: Pathlike, num_buckets: int, sample: Optional[int]) -> None:
    """
    Estimate duration bins for dynamic bucketing (prints num_buckets-1
    floats). On TPU these bins double as the compiled-shape vocabulary.
    """
    from lhotse_tpu.dataset.sampling.dynamic_bucketing import estimate_duration_buckets

    cuts = load_manifest_lazy_or_eager(cutset)
    if sample is not None:
        cuts = cuts.subset(first=sample)
    click.echo(estimate_duration_buckets(cuts, num_buckets=num_buckets))
