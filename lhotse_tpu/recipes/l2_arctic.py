"""
L2-ARCTIC: non-native English read speech (24 speakers, 6 L1 backgrounds)
plus the spontaneous "suitcase corpus" (https://psi.engr.tamu.edu/l2-arctic-corpus/).

Layout (functional parity target: ``lhotse/recipes/l2_arctic.py``)::

    <SPK>/wav/arctic_*.wav + <SPK>/transcript/arctic_*.txt
    suitcase_corpus/{wav,transcript}/<spk>.{wav,txt}

Returned splits: "read" (the ARCTIC prompts) and "suitcase" (spontaneous).
LDC-free but registration-gated; no download function.
"""
from os import makedirs
from pathlib import Path
from typing import Dict, Optional, Union

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.qa import fix_manifests, validate_recordings_and_supervisions
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike

# speaker -> (gender, native language); from the corpus description table.
SPEAKERS = {
    "aba": ("M", "Arabic"), "ska": ("F", "Arabic"), "ybaa": ("M", "Arabic"),
    "zhaa": ("F", "Arabic"), "bwc": ("M", "Chinese"), "lxc": ("F", "Chinese"),
    "ncc": ("F", "Chinese"), "txhc": ("M", "Chinese"), "asi": ("M", "Hindi"),
    "rrbi": ("M", "Hindi"), "svbi": ("F", "Hindi"), "tni": ("F", "Hindi"), "hjk": ("F", "Korean"),
    "hkk": ("M", "Korean"), "ydck": ("F", "Korean"), "ykwk": ("M", "Korean"),
    "ebvs": ("M", "Spanish"), "erms": ("M", "Spanish"), "mbmps": ("F", "Spanish"),
    "njs": ("F", "Spanish"), "hqtv": ("M", "Vietnamese"), "pnv": ("F", "Vietnamese"),
    "thv": ("F", "Vietnamese"), "tlv": ("M", "Vietnamese")}


def _identify(path: Path):
    """A transcript/wav path -> (segment id, speaker)."""
    if "suitcase_corpus" in path.parts:
        spk = path.stem.lower()
        return f"suitcase_corpus-{spk}", spk
    spk = path.parent.parent.name.lower()
    return f"{spk}-{path.stem}", spk


def prepare_l2_arctic(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """L2-ARCTIC manifests split into "read" and "suitcase" parts."""
    corpus_dir = Path(corpus_dir)
    if not corpus_dir.is_dir():
        raise AssertionError(f"No such directory: {corpus_dir}")

    recordings = RecordingSet.from_recordings(
        Recording.from_file(wav, recording_id=_identify(wav)[0])
        for wav in corpus_dir.rglob("*.wav")
    )
    supervisions = []
    for txt in corpus_dir.rglob("*.txt"):
        seg_id, spk = _identify(txt)
        gender, native_lang = SPEAKERS[spk]
        supervisions.append(
            SupervisionSegment(
                id=seg_id,
                recording_id=seg_id,
                start=0,
                duration=recordings[seg_id].duration,
                text=txt.read_text().strip(),
                language="English",
                speaker=spk,
                gender=gender,
                custom={"accent": native_lang},
            )
        )
    supervisions = SupervisionSet.from_segments(supervisions)
    recordings, supervisions = fix_manifests(recordings, supervisions)
    validate_recordings_and_supervisions(recordings, supervisions)

    def subset(keep_suitcase: bool):
        pick = (lambda s: "suitcase_corpus" in s) if keep_suitcase else (
            lambda s: "suitcase_corpus" not in s
        )
        return {
            "recordings": recordings.filter(lambda r: pick(r.id)),
            "supervisions": supervisions.filter(lambda s: pick(s.recording_id))}

    splits = {"read": subset(False), "suitcase": subset(True)}
    if output_dir is not None:
        output_dir = Path(output_dir)
        makedirs(output_dir, exist_ok=True)
        for key, m in splits.items():
            m["recordings"].to_file(output_dir / f"l2-arctic_recordings_{key}.jsonl.gz")
            m["supervisions"].to_file(output_dir / f"l2-arctic_supervisions_{key}.jsonl.gz")
    return splits
