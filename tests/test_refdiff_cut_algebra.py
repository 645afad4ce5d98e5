"""
Differential cut-algebra tests vs the ACTUAL reference implementation.

Each example builds the identical starting manifest (as a plain dict — the
wire format both implementations must agree on), deserializes it on BOTH
sides, applies the same randomized chain of manifest-level operations
(truncate / pad / extend_by / resample / perturb_* / mix / merge_supervisions
/ trim_to_supervisions / cut_into_windows / filter_supervisions), and asserts
the resulting manifests serialize to semantically identical dicts.

Reference entry points: lhotse/cut/set.py:3705 (deserialize_cut),
lhotse/cut/data.py:482-830 (DataCut ops), lhotse/cut/base.py:293-900.

No audio or features are ever loaded — this pins the manifest algebra, which
is exactly the layer a migrating user round-trips between implementations.
"""
import copy
import re
import uuid

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests._reference import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not mounted")

if ref is not None:
    from lhotse.cut.set import deserialize_cut as ref_deserialize_cut

from lhotse_tpu.cut.set import deserialize_cut as my_deserialize_cut

SR = 16000
_UUID_RE = re.compile(
    r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}", re.I
)


# ---------------------------------------------------------------------------
# Shared starting manifests (built as dicts = the wire format)
# ---------------------------------------------------------------------------
def _recording_dict(rec_id: str, duration_ms: int, channels=(0,)) -> dict:
    num_samples = int(round(duration_ms * SR / 1000))
    return {
        "id": rec_id,
        "sources": [
            {
                "type": "file",
                "channels": list(channels),
                "source": f"/nonexistent/{rec_id}.wav",
            }
        ],
        "sampling_rate": SR,
        "num_samples": num_samples,
        "duration": num_samples / SR,
        "channel_ids": list(channels),
    }


def _supervision_dict(i: int, rec_id: str, start_ms: int, dur_ms: int, channel=0) -> dict:
    return {
        "id": f"sup-{i}",
        "recording_id": rec_id,
        "start": start_ms / 1000,
        "duration": dur_ms / 1000,
        "channel": channel,
        "text": f"text {i}",
        "speaker": f"spk{i % 2}",
        "language": "en",
    }


def _cut_dict(cut_id, rec_dur_ms, start_ms, dur_ms, sups, channel=0) -> dict:
    rec_id = f"rec-{cut_id}"
    return {
        "id": str(cut_id),
        "start": start_ms / 1000,
        "duration": dur_ms / 1000,
        "channel": channel,
        "recording": _recording_dict(rec_id, rec_dur_ms),
        "supervisions": [
            _supervision_dict(i, rec_id, s, d) for i, (s, d) in enumerate(sups)
        ],
        "type": "MonoCut",
    }


# ---------------------------------------------------------------------------
# Normalized comparison
# ---------------------------------------------------------------------------
def _norm(x):
    """Round floats so 1e-12 repr noise does not fail equality; keep structure.
    Supervision lists are canonically ordered: the reference's IntervalTree-
    indexed paths iterate a set, so its tie order among equal-start segments
    is nondeterministic (reference cut/data.py:560-581) — order among ties is
    not a contract."""
    if isinstance(x, float):
        return round(x, 9)
    if isinstance(x, dict):
        out = {k: _norm(v) for k, v in x.items() if v is not None}
        if isinstance(out.get("supervisions"), list):
            out["supervisions"] = sorted(
                out["supervisions"],
                key=lambda s: (s.get("start", 0), s.get("duration", 0), str(s.get("id"))),
            )
        return out
    if isinstance(x, (list, tuple)):
        return [_norm(v) for v in x]
    return x


def _collect_mismatches(theirs, mine, path="$", out=None):
    """Like _assert_same_tree but returns leaf mismatch (path, theirs, mine)
    triples instead of asserting; structural mismatches raise."""
    if out is None:
        theirs, mine = _norm(theirs), _norm(mine)
        out = []
    if isinstance(theirs, dict) or isinstance(mine, dict):
        assert isinstance(theirs, dict) and isinstance(mine, dict), path
        assert set(theirs) == set(mine), f"{path}: key mismatch {set(theirs) ^ set(mine)}"
        for k in theirs:
            if k == "id" and theirs[k] != mine[k]:
                if _UUID_RE.match(str(theirs[k])) and _UUID_RE.match(str(mine[k])):
                    continue
            _collect_mismatches(theirs[k], mine[k], f"{path}.{k}", out)
    elif isinstance(theirs, list) or isinstance(mine, list):
        assert isinstance(theirs, list) and isinstance(mine, list), path
        assert len(theirs) == len(mine), f"{path}: len {len(theirs)} != {len(mine)}"
        for i, (a, b) in enumerate(zip(theirs, mine)):
            _collect_mismatches(a, b, f"{path}[{i}]", out)
    elif theirs != mine:
        out.append((path, theirs, mine))
    return out


def _merge_span_deviation_only(theirs_cut, mine_cut, where) -> bool:
    """True iff the only differences after merge_supervisions are the merged
    supervision's end/duration, with OURS covering a LONGER span.  The
    reference computes the merged end as ``sups[-1].end`` after sorting by
    start (reference cut/mono.py:309, cut/multi.py:290), which TRUNCATES the
    merged segment whenever an earlier-starting supervision outlasts the
    last-starting one; we take max(end) instead (documented deviation, see
    docs/migrating-from-lhotse.md)."""
    mism = _collect_mismatches(theirs_cut, mine_cut, where)
    if not mism:
        return False  # exact match — no deviation at play
    for path, t, m in mism:
        leaf = path.rsplit(".", 1)[-1]
        if ".supervisions[" not in path or leaf not in ("duration", "end"):
            raise AssertionError(f"{path}: {t!r} != {m!r}")
        if not (isinstance(t, float) and isinstance(m, float) and m > t):
            raise AssertionError(f"{path}: {t!r} != {m!r} (not the merge-span deviation)")
    return True


def _assert_same_tree(theirs, mine, path="$"):
    theirs, mine = _norm(theirs), _norm(mine)
    if isinstance(theirs, dict) or isinstance(mine, dict):
        assert isinstance(theirs, dict) and isinstance(mine, dict), path
        assert set(theirs) == set(mine), (
            f"{path}: key mismatch {set(theirs) ^ set(mine)}"
        )
        for k in theirs:
            if k == "id" and theirs[k] != mine[k]:
                # Operations without preserve_id mint random UUIDs on both
                # sides; equality of random ids is not part of the contract.
                assert _UUID_RE.match(str(theirs[k])) and _UUID_RE.match(
                    str(mine[k])
                ), f"{path}.id: {theirs[k]!r} != {mine[k]!r}"
                continue
            _assert_same_tree(theirs[k], mine[k], f"{path}.{k}")
    elif isinstance(theirs, list) or isinstance(mine, list):
        assert isinstance(theirs, list) and isinstance(mine, list), path
        assert len(theirs) == len(mine), f"{path}: len {len(theirs)} != {len(mine)}"
        for i, (a, b) in enumerate(zip(theirs, mine)):
            _assert_same_tree(a, b, f"{path}[{i}]")
    else:
        assert theirs == mine, f"{path}: {theirs!r} != {mine!r}"


# ---------------------------------------------------------------------------
# The op vocabulary (same kwargs executed on both sides)
# ---------------------------------------------------------------------------
def _apply(cut, op, is_ref: bool):
    """Apply one op spec; returns a cut or a list of cuts (set-producing ops)."""
    name, kw = op
    if name == "truncate":
        return cut.truncate(**kw)
    if name == "extend_by":
        return cut.extend_by(**kw)
    if name == "pad":
        return cut.pad(**kw)
    if name == "resample":
        return cut.resample(kw["sampling_rate"])
    if name == "perturb_speed":
        return cut.perturb_speed(kw["factor"])
    if name == "perturb_tempo":
        return cut.perturb_tempo(kw["factor"])
    if name == "perturb_volume":
        return cut.perturb_volume(kw["factor"])
    if name == "merge_supervisions":
        return cut.merge_supervisions(merge_policy=kw["merge_policy"])
    if name == "filter_supervisions":
        thr = kw["threshold"]
        return cut.filter_supervisions(lambda s: s.start >= thr)
    if name == "fill_supervision":
        return cut.fill_supervision(**kw)
    if name == "drop_supervisions":
        return cut.drop_supervisions()
    if name == "drop_recording":
        return cut.drop_recording()
    if name == "trim_to_supervisions":
        return list(cut.trim_to_supervisions(**kw))
    if name == "cut_into_windows":
        return list(cut.cut_into_windows(**kw))
    if name == "mix":
        # deserialize_cut pops 'type' from its input on BOTH sides (a shared
        # idiom pinned by test below) — hand each side its own deep copy.
        other_dict = copy.deepcopy(kw["other"])
        other = (ref_deserialize_cut if is_ref else my_deserialize_cut)(other_dict)
        return cut.mix(
            other,
            offset_other_by=kw["offset_other_by"],
            allow_padding=kw["allow_padding"],
            snr=kw["snr"],
            preserve_id=kw["preserve_id"],
        )
    raise AssertionError(f"unknown op {name}")


ms = st.integers


def _unique_starts(sups):
    """Nudge equal supervision starts apart: for EQUAL-start segments, the
    reference's IntervalTree-indexed paths iterate a SET, so its tie order
    is nondeterministic even within one process — and ops like
    merge_supervisions concatenate in that order. Tie behavior is genuinely
    unspecified in the reference; the differential excludes it."""
    seen = set()
    out = []
    for entry in sups:
        s, rest = entry[0], entry[1:]
        while s in seen:
            s += 1
        seen.add(s)
        out.append((s, *rest))
    return out


sup_strategy = st.lists(
    st.tuples(ms(-500, 9_000), ms(10, 4_000)), min_size=0, max_size=3
).map(_unique_starts)

op_strategy = st.one_of(
    st.tuples(
        st.just("truncate"),
        st.fixed_dictionaries(
            {
                "offset": ms(0, 3000).map(lambda v: v / 1000),
                "duration": st.one_of(
                    st.none(), ms(100, 6000).map(lambda v: v / 1000)
                ),
                "keep_excessive_supervisions": st.booleans(),
                "preserve_id": st.just(True),
            }
        ),
    ),
    st.tuples(
        st.just("extend_by"),
        st.fixed_dictionaries(
            {
                "duration": ms(1, 2000).map(lambda v: v / 1000),
                "direction": st.sampled_from(["left", "right", "both"]),
                "preserve_id": st.just(True),
                "pad_silence": st.booleans(),
            }
        ),
    ),
    st.tuples(
        st.just("pad"),
        st.fixed_dictionaries(
            {
                "duration": ms(1000, 15_000).map(lambda v: v / 1000),
                "direction": st.sampled_from(["left", "right", "both"]),
                "preserve_id": st.just(True),
            }
        ),
    ),
    st.tuples(
        st.just("resample"),
        st.fixed_dictionaries({"sampling_rate": st.sampled_from([8000, 22050, 44100])}),
    ),
    st.tuples(
        st.just("perturb_speed"),
        st.fixed_dictionaries({"factor": st.sampled_from([0.9, 1.1])}),
    ),
    st.tuples(
        st.just("perturb_tempo"),
        st.fixed_dictionaries({"factor": st.sampled_from([0.9, 1.1])}),
    ),
    st.tuples(
        st.just("perturb_volume"),
        st.fixed_dictionaries({"factor": st.sampled_from([0.5, 2.0])}),
    ),
    st.tuples(
        st.just("merge_supervisions"),
        st.fixed_dictionaries(
            {"merge_policy": st.sampled_from(["delimiter", "keep_first"])}
        ),
    ),
    st.tuples(
        st.just("filter_supervisions"),
        st.fixed_dictionaries({"threshold": ms(0, 5000).map(lambda v: v / 1000)}),
    ),
    st.tuples(
        st.just("fill_supervision"),
        st.fixed_dictionaries(
            {"add_empty": st.booleans(), "shrink_ok": st.just(True)}
        ),
    ),
    st.tuples(st.just("drop_supervisions"), st.fixed_dictionaries({})),

    st.tuples(
        st.just("trim_to_supervisions"),
        st.fixed_dictionaries(
            {
                "keep_overlapping": st.booleans(),
                "min_duration": st.one_of(
                    st.none(), ms(500, 3000).map(lambda v: v / 1000)
                ),
                "context_direction": st.sampled_from(["center", "left", "right"]),
            }
        ),
    ),
    st.tuples(
        st.just("cut_into_windows"),
        st.fixed_dictionaries(
            {
                "duration": ms(300, 4000).map(lambda v: v / 1000),
                "hop": st.one_of(st.none(), ms(150, 3000).map(lambda v: v / 1000)),
            }
        ),
    ),
)


def _invalid(out) -> bool:
    """True when the reference produced a manifest no validator would accept."""
    cuts = out if isinstance(out, list) else [out]
    return any(c is None or c.duration <= 0 or c.start < 0 for c in cuts)


def _run_chain(initial: dict, ops, mix_other: dict):
    """Run the chain on both sides; compare after every op."""
    theirs = ref_deserialize_cut(copy.deepcopy(initial))
    mine = my_deserialize_cut(copy.deepcopy(initial))
    _assert_same_tree(theirs.to_dict(), mine.to_dict(), "$.initial")

    for idx, (name, kw) in enumerate(ops):
        if name == "mix":
            kw = dict(kw, other=mix_other)
        op = (name, kw)
        try:
            r_out = _apply(theirs, op, is_ref=True)
            r_exc = None
        except Exception as e:
            r_out, r_exc = None, e
        try:
            m_out = _apply(mine, op, is_ref=False)
            m_exc = None
        except Exception as e:
            m_out, m_exc = None, e

        where = f"$after[{idx}]{name}({kw})"
        if r_exc is not None or m_exc is not None:
            if m_exc is not None and r_exc is None and _invalid(r_out):
                # Documented deviation: where the reference silently emits an
                # INVALID manifest (e.g. truncate(offset > duration) yields a
                # negative-duration cut despite its docstring promising None,
                # reference cut/data.py:526-539), we raise instead.
                return
            assert r_exc is not None and m_exc is not None, (
                f"{where}: one-sided failure — reference: {r_exc!r}, mine: {m_exc!r}"
            )
            return  # both refused: parity on the failure mode; chain ends

        if isinstance(r_out, list):
            assert isinstance(m_out, list), where
            assert len(r_out) == len(m_out), (
                f"{where}: {len(r_out)} cuts vs {len(m_out)}"
            )
            for i, (rc, mc) in enumerate(zip(r_out, m_out)):
                _assert_same_tree(rc.to_dict(), mc.to_dict(), f"{where}[{i}]")
            if not r_out:
                return
            theirs, mine = r_out[0], m_out[0]
        elif name == "merge_supervisions":
            if _merge_span_deviation_only(r_out.to_dict(), m_out.to_dict(), where):
                # Downstream manifests legitimately diverge from here on.
                return
            theirs, mine = r_out, m_out
        else:
            _assert_same_tree(r_out.to_dict(), m_out.to_dict(), where)
            theirs, mine = r_out, m_out


@settings(max_examples=150, deadline=None)
@given(
    st.integers(2_000, 12_000),  # recording duration ms
    st.integers(0, 2_000),  # cut start ms
    st.integers(500, 8_000),  # cut duration ms
    sup_strategy,
    st.lists(op_strategy, min_size=1, max_size=4),
    st.integers(1_000, 5_000),  # mix-other duration ms
    st.integers(0, 3),  # how many ops to swap for mix (position seed)
)
def test_mono_cut_chain_matches_reference(
    rec_ms, start_ms, dur_ms, sups, ops, other_ms, mix_pos
):
    dur_ms = min(dur_ms, rec_ms - start_ms)
    if dur_ms < 100:
        dur_ms = 100
        start_ms = max(0, rec_ms - dur_ms)
    initial = _cut_dict("base", rec_ms, start_ms, dur_ms, sups)
    mix_other = _cut_dict("other", other_ms, 0, other_ms, [(0, min(900, other_ms))])
    # Deterministically replace one op with a mix() at mix_pos (if in range)
    if mix_pos < len(ops):
        ops = list(ops)
        ops[mix_pos] = (
            "mix",
            {
                "offset_other_by": (mix_pos * 137) % 1500 / 1000,
                "allow_padding": bool(mix_pos % 2),
                "snr": [None, 0.0, 10.0, -5.0][mix_pos],
                "preserve_id": None,
            },
        )
    _run_chain(initial, ops, mix_other)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(3_000, 10_000),
    st.integers(0, 1_000),
    st.integers(500, 8_000),
    st.lists(
        st.tuples(ms(-500, 9_000), ms(10, 4_000), st.integers(0, 1)),
        min_size=0,
        max_size=3,
    ).map(_unique_starts),
    st.lists(op_strategy, min_size=1, max_size=4),
)
def test_multi_cut_chain_matches_reference(rec_ms, start_ms, dur_ms, sups, ops):
    """Two-channel MultiCut chains (reference cut/multi.py ops)."""
    dur_ms = max(100, min(dur_ms, rec_ms - start_ms))
    rec_id = "rec-m"
    initial = {
        "id": "m",
        "start": start_ms / 1000,
        "duration": dur_ms / 1000,
        "channel": [0, 1],
        "recording": _recording_dict(rec_id, rec_ms, channels=(0, 1)),
        "supervisions": [
            _supervision_dict(i, rec_id, s, d, channel=c)
            for i, (s, d, c) in enumerate(sups)
        ],
        "type": "MultiCut",
    }
    # mix() on MultiCut requires matching channels; keep chains to non-mix ops.
    ops = [op for op in ops if op[0] != "mix"]
    if not ops:
        ops = [("truncate", {"offset": 0.0, "duration": None,
                             "keep_excessive_supervisions": True, "preserve_id": True})]
    _run_chain(initial, ops, _cut_dict("o", 2000, 0, 2000, []))


@settings(max_examples=60, deadline=None)
@given(
    st.integers(3_000, 10_000),
    sup_strategy,
    st.lists(op_strategy, min_size=1, max_size=3),
)
def test_padding_heavy_chain_matches_reference(rec_ms, sups, ops):
    """Start from an already-padded (Mixed) cut to cover MixedCut op parity."""
    initial = _cut_dict("p", rec_ms, 0, rec_ms, sups)
    theirs = ref_deserialize_cut(copy.deepcopy(initial)).pad(
        duration=rec_ms / 1000 + 2.0, preserve_id=True
    )
    mine = my_deserialize_cut(copy.deepcopy(initial)).pad(
        duration=rec_ms / 1000 + 2.0, preserve_id=True
    )
    _assert_same_tree(theirs.to_dict(), mine.to_dict(), "$.padded")
    # Continue the chain from the serialized FORM of the reference's result so
    # both sides keep identical random padding-cut ids.
    d = theirs.to_dict()
    _run_chain(d, ops, _cut_dict("o", 2000, 0, 2000, []))
