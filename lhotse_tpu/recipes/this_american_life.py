"""
This American Life — 663 radio-program podcasts (637 h) with aligned
transcripts (https://arxiv.org/pdf/2005.08072.pdf).

Reference behavior: `/root/reference/lhotse/recipes/this_american_life.py`
(download_this_american_life :52-88 — metadata zip + per-episode mp3 scrape;
prepare subset :96-155 — ``{subset}-transcripts-aligned.json`` utterances
with word alignments indexing into the tokenized text; 'dev' maps to the
'valid' file).

Deviation: word tokenization uses nltk when installed (reference behavior)
and a Penn-Treebank-ish regex fallback otherwise.
"""
import json
import logging
import re
import zipfile
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Union
from urllib.error import HTTPError

from lhotse_tpu.audio import Recording, RecordingSet
from lhotse_tpu.recipes.utils import finalize_manifests
from lhotse_tpu.supervision import AlignmentItem, SupervisionSegment, SupervisionSet
from lhotse_tpu.utils import Pathlike, is_module_available, resumable_download

_METADATA_URL = (
    "https://ipfs.io/ipfs/bafybeidyt3ch6t4dtu2ehdriod3jvuh34qu4pwjyoba2jrjpmqwckkr6q4/"
    "this_american_life.zip")
_WEBSITE_URL = "https://thisamericanlife.org"

_FALLBACK_TOKEN = re.compile(r"\w+(?:['']\w+)?|[^\w\s]")


def _tokenize(text: str) -> List[str]:
    if is_module_available("nltk"):
        try:
            from nltk import word_tokenize

            return word_tokenize(text)
        except LookupError:
            # nltk is installed but its tokenizer data (punkt) is not
            # downloaded; the regex fallback keeps the recipe usable offline.
            pass
    return _FALLBACK_TOKEN.findall(text)


def scrape_urls(website_url: str, output_path: Pathlike, year_range=(1995, 2021)) -> None:
    """Scrape per-episode mp3 URLs off the program's archive pages."""
    if not (is_module_available("bs4") and is_module_available("requests")):
        raise ImportError("Please 'pip install beautifulsoup4 requests' first.")
    import requests
    from bs4 import BeautifulSoup

    urls = {}
    for year in range(*year_range):
        logging.info(f"Scraping {year}...")
        soup = BeautifulSoup(
            requests.get(f"{website_url}/archive?year={year}").text, "html.parser")
        page_urls = {
            f"{website_url}{a['href']}"
            for a in soup.find_all("a", href=True, class_="goto-episode")
            if a["href"].startswith("/")}
        for episode_url in page_urls:
            episode_id = int(episode_url.split("/")[-2])
            ep_soup = BeautifulSoup(requests.get(episode_url).text, "html.parser")
            for a in ep_soup.find_all("a", href=True, download=True):
                urls[f"ep-{episode_id}"] = a["href"]
    logging.info(f"Saving results ({len(urls)} episodes)...")
    Path(output_path).write_text(json.dumps(urls))


def included_episodes(target_dir: Pathlike) -> Iterable[str]:
    for subset in ("train", "valid", "test"):
        with open(Path(target_dir) / f"{subset}-transcripts-aligned.json") as f:
            yield from json.load(f).keys()


def download_this_american_life(
    target_dir: Pathlike = ".", force_download: bool = False,
    metadata_url: str = _METADATA_URL, website_url: str = _WEBSITE_URL) -> None:
    """Fetch the aligned-transcript metadata and each episode's mp3."""
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    zip_path = target_dir / "metadata.zip"
    if not (target_dir / "README.txt").is_file() or force_download:
        resumable_download(metadata_url, zip_path, force_download=force_download)
        with zipfile.ZipFile(zip_path, "r") as zip_ref:
            logging.info("Extracting...")
            zip_ref.extractall(target_dir)
        zip_path.unlink()
    urls_path = target_dir / "urls.json"
    if not urls_path.is_file():
        scrape_urls(website_url, urls_path)
    urls = json.loads(urls_path.read_text())
    audio_dir = target_dir / "audio"
    audio_dir.mkdir(exist_ok=True)
    for ep_id in included_episodes(target_dir):
        logging.info(f"Downloading episode {ep_id}... ({urls[ep_id]})")
        try:
            resumable_download(
                urls[ep_id], audio_dir / f"{ep_id}.mp3", force_download=force_download)
        except HTTPError as e:
            logging.warning(f"Failed to download {ep_id}: {e}. Skipping...")


def prepare_this_american_life_subset(
    corpus_dir: Pathlike, subset: str, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Union[RecordingSet, SupervisionSet]]:
    corpus_dir = Path(corpus_dir).absolute()
    file_subset = "valid" if subset == "dev" else subset
    transcripts = json.loads(
        (corpus_dir / f"{file_subset}-transcripts-aligned.json").read_text())

    recordings, supervisions = [], []
    for ep_id, transcript in transcripts.items():
        audio_path = corpus_dir / "audio" / f"{ep_id}.mp3"
        if not audio_path.is_file():
            logging.warning(f"File {audio_path} not found - skipping.")
            continue
        recordings.append(Recording.from_file(audio_path))
        for utt_ix, utt in enumerate(transcript):
            text = utt["utterance"]
            words = _tokenize(text)
            if len(words) != utt["n_words"]:
                logging.warning(
                    f"Transcript mismatch for {ep_id}-{utt_ix}: {utt['n_words']} words "
                    f"in the transcript, {len(words)} tokens in the text.")
            alignment = [
                AlignmentItem(words[int(ix)], start, end - start)
                for start, end, ix in utt["alignments"]
                if ix < len(words)]
            supervisions.append(
                SupervisionSegment(
                    id=f"{ep_id}-{utt_ix}", recording_id=ep_id,
                    start=utt["utterance_start"],
                    duration=utt["utterance_end"] - utt["utterance_start"], channel=0,
                    text=text, language="en", speaker=utt["speaker"],
                ).with_alignment("word", alignment))
    return finalize_manifests(
        recordings, supervisions, output_dir=output_dir,
        prefix="this-american-life", part=subset)


def prepare_this_american_life(
    corpus_dir: Pathlike, output_dir: Optional[Pathlike] = None,
) -> Dict[str, Dict[str, Union[RecordingSet, SupervisionSet]]]:
    """train/dev/test manifests off the aligned-transcript JSONs + mp3s."""
    return {
        subset: prepare_this_american_life_subset(corpus_dir, subset, output_dir)
        for subset in ("train", "dev", "test")}
