"""
CutSet-level forced-alignment driver.

Parity target:
`/root/reference/lhotse/workflows/forced_alignment/workflow.py:26-90`
(``align_with_torchaudio``). The native entry point is
:func:`align_supervisions`, which fans the per-cut work out over a
:class:`~lhotse_tpu.parallel.pool.ParallelExecutor` (aligner constructed
once per worker). ``align_with_torchaudio`` is kept as a thin compatibility
alias so reference user code keeps working — it maps the reference's
torchaudio bundle names onto the equivalent transformers checkpoints.
"""
from __future__ import annotations

from functools import partial
from typing import Generator, Optional

from lhotse_tpu.parallel.pool import ParallelExecutor

# Reference torchaudio bundle name -> transformers checkpoint.
_BUNDLE_TO_CHECKPOINT = {
    "WAV2VEC2_ASR_BASE_960H": "facebook/wav2vec2-base-960h",
    "WAV2VEC2_ASR_BASE_100H": "facebook/wav2vec2-base-100h",
    "WAV2VEC2_ASR_LARGE_960H": "facebook/wav2vec2-large-960h",
    "WAV2VEC2_ASR_LARGE_LV60K_960H": "facebook/wav2vec2-large-960h-lv60-self",
    "VOXPOPULI_ASR_BASE_10K_EN": "facebook/wav2vec2-base-10k-voxpopuli-ft-en",
    "HUBERT_ASR_LARGE": "facebook/hubert-large-ls960-ft",
    "HUBERT_ASR_XLARGE": "facebook/hubert-xlarge-ls960-ft"}


def align_supervisions(
    cuts, model_name: str = "facebook/wav2vec2-base-960h", device: str = "cpu",
    normalize_text: bool = True, num_jobs: int = 1, verbose: bool = False,
    aligner_factory: Optional[callable] = None) -> Generator:
    """
    Word-level forced alignment of every supervision in ``cuts``; yields cuts
    whose supervisions carry a ``"word"`` alignment.

    :param model_name: a transformers CTC checkpoint name or path.
    :param aligner_factory: advanced — zero-arg callable returning a
        :class:`~lhotse_tpu.workflows.forced_alignment.base.ForcedAligner`;
        overrides ``model_name`` (used for custom aligners and testing).
    """
    if aligner_factory is None:
        from lhotse_tpu.workflows.forced_alignment.asr_aligner import (TransformersForcedAligner,)

        aligner_factory = partial(TransformersForcedAligner, bundle_name=model_name, device=device)
    processor = ParallelExecutor(
        init_fn=aligner_factory, num_jobs=num_jobs, verbose=verbose, description="Aligning")
    return processor(cuts, normalize=normalize_text)


def align_with_torchaudio(
    cuts, bundle_name: str = "WAV2VEC2_ASR_BASE_960H", device: str = "cpu",
    normalize_text: bool = True, num_jobs: int = 1, verbose: bool = False,
    check_language: bool = True) -> Generator:
    """Compatibility alias for the reference API (workflow.py:26): maps the
    torchaudio bundle name to its transformers checkpoint and delegates to
    :func:`align_supervisions`. ``MMS_FA`` routes to the multilingual
    :class:`~lhotse_tpu.workflows.forced_alignment.mms_aligner.MMSForcedAligner`."""
    if bundle_name == "MMS_FA":
        from lhotse_tpu.workflows.forced_alignment.mms_aligner import MMSForcedAligner

        return align_supervisions(
            cuts, device=device, normalize_text=normalize_text, num_jobs=num_jobs,
            verbose=verbose,
            aligner_factory=partial(
                MMSForcedAligner, device=device, check_language=check_language))
    model_name = _BUNDLE_TO_CHECKPOINT.get(bundle_name)
    if model_name is None:
        raise ValueError(
            f"Unknown bundle name: {bundle_name}. Known: "
            f"{sorted(_BUNDLE_TO_CHECKPOINT)} — or call align_supervisions() "
            f"with any transformers CTC checkpoint."
        )
    return align_supervisions(
        cuts, model_name=model_name, device=device, normalize_text=normalize_text,
        num_jobs=num_jobs, verbose=verbose)
