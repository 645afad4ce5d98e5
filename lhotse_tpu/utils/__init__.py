from lhotse_tpu.utils.core import *  # noqa: F401,F403
from lhotse_tpu.utils.core import (
    DEFAULT_PADDING_VALUE, EPSILON, INT16MAX, LOG_EPSILON, Channels, Decibels, Pathlike, Pipe,
    Seconds, SmartOpen, T, TimeSpan, add_durations, asdict_nonull, compute_num_frames,
    compute_num_frames_from_samples, compute_num_samples, compute_num_windows,
    compute_start_duration_for_extended_cut, during_docs_build, exactly_one_not_null, fastcopy,
    fix_random_seed, hash_str_to_int, ifnone, index_by_id_and_check, is_equal_or_contains,
    is_module_available, is_none_or_gt, is_valid_url, load_rng_state, measure_overlap_frac,
    merge_items_with_delimiter, nullcontext, overlaps, overspans, perturb_num_samples,
    recursion_limit, resumable_download, check_and_rglob, rich_exception_info, safe_extract, safe_extract_rar,
    save_rng_state, split_sequence, streaming_shuffle, supervision_to_frames,
    supervision_to_samples, suppress_and_warn, to_hashable, to_list, uuid4)
