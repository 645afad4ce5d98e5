"""
Geolocated web radio — ~4000 h of radio-stream clips with broadcast
location/time/station metadata, used for speech geolocation ("Where are you
from?", NAACL 2024).  Data access by email (see the reference docstring).

Reference behavior: `/root/reference/lhotse/recipes/radio.py`
(_make_reco_and_sups_from_file :44-92 — segs/segs.N/<clip>.json VAD segments
paired with recos/recos.N/<clip>.flac; lat/long/station/date parsed from the
file name; male/female segments above the min duration kept;
prepare_radio :94-143 — streamed straight into lazy manifest writers).
"""
import json
import re
from functools import partial
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.parallel import parallel_map
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike

_LATLONG = re.compile(r"lat[^_]+_long[^_]+")
_STATION = re.compile(r"s_dur[0-9]+_(.*)_lat[^_]+_long[^_]+")


def _make_reco_and_sups_from_file(seg_file: Path, msd: float = 0.5):
    """One clip's (supervisions, recording) off its VAD-segment JSON."""
    seg_file = Path(seg_file)
    corpus_dir = seg_file.parents[2]
    fname = seg_file.with_suffix(".flac").stem
    chunk_idx = int(seg_file.parent.suffix.strip("."))
    reco = Recording.from_file(
        corpus_dir / "recos" / f"recos.{chunk_idx}" / f"{fname}.flac",
        recording_id=fname)

    lat, lon = _LATLONG.search(seg_file.stem).group(0).split("_")
    lat = float(lat.replace("lat", ""))
    lon = float(lon.replace("long", ""))
    station = _STATION.search(fname).groups()[0]
    date = [int(i.strip("hms")) for i in fname.split("_")[0:6]]  # YY MM DD hh mm ss

    sups = []
    for seg in json.loads(seg_file.read_text()):
        start, end = float(seg[1]), float(seg[2])
        dur = end - start
        if seg[0] in ("male", "female") and dur > msd:
            sups.append(
                SupervisionSegment(
                    id=f"{fname}_{int(100 * start):04}", recording_id=fname,
                    start=start, duration=round(dur, 4), channel=0,
                    custom={
                        "date": date, "lat": lat, "lon": lon, "station": station,
                        "est_gender": seg[0]}))
    return sups, reco


def prepare_radio(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
    min_segment_duration: float = 0.5, num_jobs: int = 4,
) -> Dict[str, Union[RecordingSet, SupervisionSet]]:
    """Stream recording + VAD-supervision manifests off the segs/recos trees."""
    corpus_dir = Path(corpus_dir)
    if output_dir is None:
        raise ValueError("prepare_radio requires output_dir (manifests are streamed).")
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    segment_files = corpus_dir.rglob("segs/*/*.json")
    build = partial(_make_reco_and_sups_from_file, msd=min_segment_duration)
    with RecordingSet.open_writer(output_dir / "radio_recordings.jsonl.gz") as rec_writer, \
            SupervisionSet.open_writer(
                output_dir / "radio_supervisions.jsonl.gz") as sup_writer:
        for sups, reco in parallel_map(build, segment_files, num_jobs=num_jobs):
            rec_writer.write(reco)
            for sup in sups:
                sup_writer.write(sup)
    return {
        "recordings": RecordingSet.from_jsonl_lazy(rec_writer.path),
        "supervisions": SupervisionSet.from_jsonl_lazy(sup_writer.path)}
