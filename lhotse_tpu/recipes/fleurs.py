"""
FLEURS recipe — 102-language n-way parallel speech benchmark (google/fleurs
on the HuggingFace hub).

Reference behavior: `/root/reference/lhotse/recipes/fleurs.py:152-410` —
download streams each language split through ``datasets`` and materializes
wavs + per-split metadata TSVs (id / filename / raw text / text / chars /
num_samples / gender); prepare builds per-language train/dev/test manifests
from those TSVs, with prompt-occurrence-numbered supervision ids/speakers.
"""
import logging
from pathlib import Path
from typing import Dict, Optional, Sequence, Union

from lhotse_tpu import fix_manifests
from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.parallel import parallel_map
from lhotse_tpu.supervision import SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, is_module_available

DEFAULT_LANGUAGES = (
    "af_za am_et ar_eg as_in ast_es az_az be_by bg_bg bn_in bs_ba ca_es "
    "ceb_ph ckb_iq cmn_hans_cn cs_cz cy_gb da_dk de_de el_gr en_us et_ee "
    "fa_ir ff_sn fi_fi fil_ph fr_fr ga_ie gl_es gu_in ha_ng he_il hi_in "
    "hr_hr hu_hu hy_am id_id ig_ng is_is it_it ja_jp jv_id ka_ge kam_ke "
    "kea_cv kk_kz km_kh kn_in ko_kr ky_kg lb_lu lg_ug ln_cd lo_la lt_lt "
    "luo_ke lv_lv mi_nz mk_mk ml_in mn_mn mr_in ms_my mt_mt my_mm nb_no "
    "ne_np nl_nl nso_za ny_mw oc_fr om_et or_in pa_in pl_pl ps_af pt_br "
    "ro_ro ru_ru sd_in sk_sk sl_si sn_zw so_so sr_rs sv_se sw_ke ta_in "
    "te_in tg_tj th_th tr_tr uk_ua umb_ao ur_pk uz_uz vi_vn wo_sn xh_za "
    "yo_ng yue_hant_hk zu_za"
).split()


def _resolve_languages(languages) -> Sequence[str]:
    if isinstance(languages, str):
        return DEFAULT_LANGUAGES if languages == "all" else [languages]
    if languages and languages[0] == "all":
        return DEFAULT_LANGUAGES
    return list(languages)


def download_single_fleurs_language(
    target_dir: Pathlike, language: str, force_download: bool = False) -> Path:
    """Stream one language from google/fleurs and materialize wavs +
    metadata TSVs in the reference's on-disk layout."""
    assert is_module_available("datasets"), (
        "The huggingface datasets package is not installed "
        "(pip install datasets)."
    )
    from datasets import load_dataset

    from lhotse_tpu.audio.backend import save_audio

    target_dir = Path(target_dir)
    metadata_dir = target_dir.parents[0] / "metadata" / language
    target_dir.mkdir(parents=True, exist_ok=True)
    metadata_dir.mkdir(parents=True, exist_ok=True)
    completed_detector = target_dir / f".{language}_completed"
    if completed_detector.is_file() and not force_download:
        logging.info(f"Skipping download: {completed_detector} exists.")
        return target_dir

    for split in ("train", "validation", "test"):
        dataset = load_dataset(
            "google/fleurs", language, cache_dir=target_dir, streaming=True, split=split)
        osplit = "dev" if split == "validation" else split
        split_dir = target_dir / osplit
        split_dir.mkdir(parents=True, exist_ok=True)
        metadata = []
        for data in dataset:
            fname = Path(data["audio"]["path"]).name
            save_audio(split_dir / fname, data["audio"]["array"], data["audio"]["sampling_rate"])
            metadata.append(
                [
                    str(data["id"]),
                    fname,
                    data["raw_transcription"],
                    data["transcription"],
                    " ".join("|".join(data["transcription"].split())) + " |",
                    str(data["num_samples"]),
                    "FEMALE" if data["gender"] == 1 else "MALE",
                ]
            )
        with open(metadata_dir / f"{osplit}.tsv", "w") as f:
            for md in metadata:
                print("\t".join(md), file=f)
    completed_detector.touch()
    return target_dir


def download_fleurs(
    target_dir: Pathlike = ".", languages: Optional[Union[str, Sequence[str]]] = "all",
    force_download: Optional[bool] = False) -> Path:
    target_dir = Path(target_dir)
    corpus_dir = target_dir / "fleurs"
    (corpus_dir / "metadata").mkdir(parents=True, exist_ok=True)
    for lang in _resolve_languages(languages):
        download_single_fleurs_language(corpus_dir / lang, lang, force_download)
    return corpus_dir


def _make_recording(path):
    return Recording.from_file(path, recording_id=Path(path).stem)


def prepare_single_fleurs_language(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None, language: str = "language",
    num_jobs: int = 1) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """One language's train/dev/test manifests from the metadata TSVs."""
    corpus_dir = Path(corpus_dir)
    supervisions = {"train": [], "dev": [], "test": []}
    for dset in ("train", "dev", "test"):
        prompt_ids: Dict[str, int] = {}
        tsv = corpus_dir.parents[0] / "metadata" / corpus_dir.stem / f"{dset}.tsv"
        for line in tsv.read_text().splitlines():
            prompt_id, fname, raw_text, text, _, nsamples, gender = line.split("\t")
            prompt_ids[prompt_id] = prompt_ids.get(prompt_id, 0) + 1
            fname = Path(fname).stem
            supervisions[dset].append(
                SupervisionSegment(
                    id=f"{prompt_id}_{prompt_ids[prompt_id]}_{fname}",
                    recording_id=fname,
                    start=0.0,
                    duration=round(int(nsamples) / 16000, 4),
                    channel=0,
                    text=text,
                    language=language,
                    speaker=f"{prompt_id}_{prompt_ids[prompt_id]}",
                    gender=gender,
                    custom={"raw_text": raw_text},
                )
            )
    manifests = {}
    for dset in ("train", "dev", "test"):
        recordings = list(
            parallel_map(
                _make_recording,
                (
                    corpus_dir / dset / f"{s.recording_id}.wav"
                    for s in supervisions[dset]
                ),
                num_jobs=num_jobs,
            )
        )
        recos, sups = fix_manifests(
            RecordingSet.from_recordings(recordings),
            SupervisionSet.from_segments(supervisions[dset]))
        manifests[dset] = {"recordings": recos, "supervisions": sups}
    return manifests


def prepare_fleurs(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
    languages: Optional[Union[str, Sequence[str]]] = "all", num_jobs: int = 1,
) -> Dict[str, Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]]:
    """``result[language][split] = {recordings, supervisions}``."""
    corpus_dir = Path(corpus_dir)
    assert corpus_dir.is_dir(), f"No such directory: {corpus_dir}"
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)

    manifests = {}
    for lang in _resolve_languages(languages):
        lang_dir = corpus_dir / lang
        if not lang_dir.is_dir():
            logging.info(f"Skipping {lang}. No directory {lang_dir} found.")
            continue
        manifests[lang] = prepare_single_fleurs_language(
            lang_dir, output_dir / lang if output_dir else None, language=lang, num_jobs=num_jobs)
        if output_dir is not None:
            (output_dir / lang).mkdir(parents=True, exist_ok=True)
            for dset in ("train", "dev", "test"):
                for kind in ("recordings", "supervisions"):
                    manifests[lang][dset][kind].to_file(
                        output_dir
                        / lang
                        / f"fleurs-{lang}_{kind}_{dset}.jsonl.gz"
                    )
    return manifests
