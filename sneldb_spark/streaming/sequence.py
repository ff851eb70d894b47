"""Streaming sequence (funnel) matching: FOLLOWED BY over a live stream.

The batch engine evaluates ``A FOLLOWED BY B LINKED BY k`` as an as-of
join (plans/sequence.py). This module gives the same pairing
incrementally over an unbounded stream via ``applyInPandasWithState``:
per link key, the state is the list of still-unmatched A events; when a
B arrives, every pending A with ``ts_A <= ts_B`` matches that B (it is
the first B at-or-after their timestamps — timestamps are server-assigned
at ingest, so the stream is in arrival order and no watermark is needed,
the reference's T2 semantics) and leaves the state.

Emitted pairs are exactly the batch semantics (first B at-or-after each
A, one match per A, a B may serve many As) as long as per-key arrival
order matches timestamp order — which server-assigned timestamps
guarantee. Same-timestamp A/B pairs match, tie-broken by processing A
before B within a micro-batch (matcher.rs:310-464 parity).

Scale shape: state is per-link-key and holds only UNMATCHED As (funnel
abandoners), pruned on every match; the operator shuffles once on the
link key per micro-batch — the streaming analogue of the batch plan's
single shuffle. A `state_ttl_rows` cap bounds memory per hot key.

Multi-source caveat (applies to every matcher here, incl.
streaming_chain): the in-order-arrival guarantee is PER SOURCE. A union
of several file streams (e.g. one per event type over the engine's
per-type directories) can deliver one source's newer commit a
micro-batch before another source's older one — an always-on trigger
racing a multi-type FLUSH does exactly that. Drain such unions with
``trigger(availableNow=True)`` at flush barriers (each drain then sees
complete flushes, in order; state persists across drains via the
checkpoint — pinned by tests/test_streaming.py's live-store test), or
feed a single combined stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MATCH_SCHEMA = T.StructType(
    [
        T.StructField("link", T.StringType()),
        T.StructField("a_event_id", T.LongType()),
        T.StructField("a_timestamp", T.LongType()),
        T.StructField("b_event_id", T.LongType()),
        T.StructField("b_timestamp", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.ArrayType(T.LongType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
    ]
)


def streaming_followed_by(
    events: DataFrame,
    head_type: str,
    tail_type: str,
    link_field: str,
    state_ttl_rows: int = 100_000,
    max_gap_s: int | None = None,
) -> DataFrame:
    """events: a streaming DataFrame with at least
    (event_type, timestamp, event_id, <link_field>). Returns the matched
    pair stream (append mode).

    `max_gap_s` adds the conversion window (batch `sequence_match`
    parity): a pending A only matches a B within the window — and, more
    importantly for an unbounded stream, an A older than the window
    relative to the newest event on its key can NEVER match again, so
    it is dropped from state. With a window set, state per key is
    bounded by the arrival rate times the window instead of the
    `state_ttl_rows` backstop."""

    def match_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pend_ts: list[int]
        pend_id: list[int]
        if state.exists:
            pend_ts, pend_id = [list(x) for x in state.get]
        else:
            pend_ts, pend_id = [], []
        out: dict[str, list[Any]] = {
            "link": [], "a_event_id": [], "a_timestamp": [],
            "b_event_id": [], "b_timestamp": [],
        }
        link = key[0]
        # One sort across ALL of this micro-batch's chunks: chunk
        # boundaries within a group carry no ordering guarantee, and a
        # per-chunk sort alone would let a late chunk's B see an
        # already-expired A (or miss a pending one).
        chunks = list(pdfs)
        if chunks:
            batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            # A before B at equal timestamps so same-ts pairs match.
            batch = batch.sort_values(
                ["timestamp", "__side", "event_id"], kind="stable"
            )
            batch_max_ts: int | None = None
            for ts, side, eid in zip(
                batch["timestamp"], batch["__side"], batch["event_id"]
            ):
                ts = int(ts)
                batch_max_ts = ts if batch_max_ts is None else max(batch_max_ts, ts)
                if side == 0:  # A: becomes pending
                    pend_ts.append(ts)
                    pend_id.append(int(eid))
                else:  # B: first B at-or-after every pending A with ts_A <= ts_B
                    keep_ts, keep_id = [], []
                    for a_ts, a_id in zip(pend_ts, pend_id):
                        if a_ts <= ts:
                            if max_gap_s is None or ts - a_ts <= max_gap_s:
                                out["link"].append(link)
                                out["a_event_id"].append(a_id)
                                out["a_timestamp"].append(a_ts)
                                out["b_event_id"].append(int(eid))
                                out["b_timestamp"].append(ts)
                            # matched OR expired (first B was out of
                            # window; later Bs are even further): either
                            # way the A leaves the state
                        else:
                            keep_ts.append(a_ts)
                            keep_id.append(a_id)
                    pend_ts, pend_id = keep_ts, keep_id
            if max_gap_s is not None and pend_ts and batch_max_ts is not None:
                # Expire ONLY after the whole batch, from the batch's max
                # ts (ADVICE r4): a mid-batch horizon could evict an A
                # that a not-yet-processed in-window B would still match.
                # Cross-BATCH order is guaranteed by server-assigned
                # ingest timestamps (see module docstring): every event
                # of a later micro-batch has ts >= this batch's max, so
                # an A older than the window relative to it can never
                # match again.
                horizon = batch_max_ts - max_gap_s
                alive = [
                    (a, i) for a, i in zip(pend_ts, pend_id) if a >= horizon
                ]
                pend_ts = [a for a, _ in alive]
                pend_id = [i for _, i in alive]
        if len(pend_ts) > state_ttl_rows:  # bound memory on hot keys
            pend_ts = pend_ts[-state_ttl_rows:]
            pend_id = pend_id[-state_ttl_rows:]
        state.update((pend_ts, pend_id))
        if out["link"]:
            yield pd.DataFrame(out)

    sides = _sided(events, head_type, tail_type, link_field)
    return sides.groupBy("__link").applyInPandasWithState(
        match_fn,
        outputStructType=MATCH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_PRECEDED_STATE_SCHEMA = T.StructType(
    [
        T.StructField("b_ts", T.LongType()),
        T.StructField("b_id", T.LongType()),
    ]
)


def streaming_preceded_by(
    events: DataFrame,
    head_type: str,
    tail_type: str,
    link_field: str,
    max_gap_s: int | None = None,
) -> DataFrame:
    """``A PRECEDED BY B``: each arriving A pairs with the LATEST B seen
    strictly before it. State per link key is a single (ts, id) — the
    smallest possible stateful operator: O(1) memory per key however hot
    the stream. `max_gap_s` adds the conversion window: the pair only
    counts when the A lands within the window of that latest B (the
    latest B is the closest, so the filter is exact — batch
    `sequence_match(max_gap_s=...)` parity)."""

    def match_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        b_ts, b_id = state.get if state.exists else (None, None)
        out: dict[str, list[Any]] = {
            "link": [], "a_event_id": [], "a_timestamp": [],
            "b_event_id": [], "b_timestamp": [],
        }
        link = key[0]
        # single sort across all chunks — see streaming_followed_by: an
        # unordered chunk boundary must not make an A pair with a stale
        # "latest" B when the true latest sits in a later chunk
        chunks = list(pdfs)
        if chunks:
            batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            batch = batch.sort_values(
                ["timestamp", "__side", "event_id"], kind="stable"
            )
            for ts, side, eid in zip(
                batch["timestamp"], batch["__side"], batch["event_id"]
            ):
                if side == 1:  # B: becomes the latest candidate
                    b_ts, b_id = int(ts), int(eid)
                elif (
                    b_ts is not None
                    and b_ts < ts
                    and (max_gap_s is None or ts - b_ts <= max_gap_s)
                ):  # strict before, inside the window
                    out["link"].append(link)
                    out["a_event_id"].append(int(eid))
                    out["a_timestamp"].append(int(ts))
                    out["b_event_id"].append(b_id)
                    out["b_timestamp"].append(b_ts)
        if b_ts is not None:
            state.update((b_ts, b_id))
        if out["link"]:
            yield pd.DataFrame(out)

    sides = _sided(events, head_type, tail_type, link_field)
    return sides.groupBy("__link").applyInPandasWithState(
        match_fn,
        outputStructType=MATCH_SCHEMA,
        stateStructType=_PRECEDED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_chain(
    events: DataFrame,
    step_types: list[str],
    link_field: str,
    state_ttl_rows: int = 100_000,
    max_gap_s: int | None = None,
    key_buckets: int = 0,
) -> DataFrame:
    """Multi-step streaming funnel: ``E0 FOLLOWED BY E1 FOLLOWED BY ...``
    matched incrementally (the streaming analogue of the batch
    `plans/sequence.py sequence_match_chain`; the reference caps chains at
    one link, matcher.rs:297-307 — this is the same extension surface).

    Semantics are the batch chain's, evaluated greedily as events arrive
    in server-timestamp order: an E0 starts a chain; an arriving event at
    step position i advances EVERY pending chain awaiting that step whose
    cursor ts <= its ts (it is the earliest at-or-after candidate for all
    of them — ties processed earlier-position-first so an equal-ts event
    can serve adjacent steps of the same chain, the batch tie rule). A
    chain that completes the last step emits one row with every step's
    (event_id, timestamp); chains advance once per step (one match per
    head) and a single event may serve many chains.

    `max_gap_s` bounds every adjacent link gap (batch WITHIN parity) and
    doubles as the state horizon: a pending chain whose cursor is older
    than the window relative to the key's newest event can never advance
    again and is dropped after the batch (never mid-batch — a horizon
    computed mid-batch could evict a chain an in-window event later in
    the same batch would still advance).

    Output contract (ADVICE r5): `state_ttl_rows` is a memory backstop,
    not a semantic knob — when a single link key holds more pending
    chains than the cap, the OLDEST pending chains are dropped and any
    match they would later have completed is silently missing, a
    documented divergence from the batch matcher on such keys. Batch
    parity is exact whenever no key exceeds the cap (the parity tests
    pin this); set `max_gap_s` so expiry, not the cap, bounds hot keys.

    State per link key is the list of incomplete chains, flat-encoded
    (per-chain matched-step count + concatenated ts/id histories) so the
    GroupState stays a fixed three-array struct at any chain length;
    `state_ttl_rows` caps total pending chains on a hot key (newest
    kept). One shuffle on the link key per micro-batch, like the
    single-link matchers.

    `key_buckets > 0` coarsens the stateful grouping from one Python
    dispatch PER LINK KEY to one per hash bucket (VERDICT r5 #3): with
    millions of small link keys per micro-batch, `applyInPandasWithState`
    overhead is dominated by per-group Arrow serialization + function
    dispatch, not matching work. Bucketing multiplexes every link of a
    bucket through one pandas call and one state row (per-link chains are
    flat-encoded with a parallel `links` array), cutting dispatch count by
    the keys/buckets ratio while keeping semantics exactly per-link:
    the batch is sorted once (stable), so each link sees its own events
    in (ts, minpos, event_id) order; expiry horizons and the
    `state_ttl_rows` cap stay per-link. Inside a bucket the matching
    itself is fully vectorized (`_vector_chain_match`: numpy
    searchsorted rounds over per-step candidate arrays, VERDICT r6 #2 —
    no per-event Python). Pick buckets ~4-8x your parallelism. 0
    preserves the one-group-per-key layout (and its checkpoint state
    schema) unchanged, matched by the per-event loop — cheaper than the
    vector setup on the tiny per-key groups that layout produces.

    Scale rule (measured, r12, sf1 = 10x the harness SF): the per-key
    layout's dispatch cost scales with DISTINCT LINK KEYS, not rows —
    45.8 s per-key vs 2.95 s bucketed on identical output (183k chains),
    with the batch matcher at 4.6 s. Above ~1e5 live link keys per
    batch, key_buckets is the production layout; per-key is for small
    key populations (BASELINE.md round-12 streaming decomposition)."""
    if len(step_types) < 2:
        raise ValueError("streaming_chain needs at least two step types")
    n_steps = len(step_types)
    # a type may occur at several positions; the event serves each,
    # ascending, so cascades through equal-ts adjacent steps work
    positions: dict[str, list[int]] = {}
    for i, t in enumerate(step_types):
        positions.setdefault(t, []).append(i)

    # nested (not module-level) so cloudpickle ships it BY VALUE with
    # bucket_match_fn: executors never need sneldb_spark importable
    # (the house rule for every Arrow kernel in this repo)
    def _vector_chain_match(
        batch: pd.DataFrame | None,
        st_links: list,
        st_steps: list,
        st_flat_ts: list,
        st_flat_id: list,
        n_steps: int,
        positions: dict[str, list[int]],
        max_gap_s: int | None,
        state_ttl_rows: int,
    ) -> tuple:
        """Vectorized multi-link chain matching over one sorted micro-batch
        (VERDICT r6 #2: replaces the per-event Python loop for the bucketed
        layout — the loop was the remaining 2.9x-of-batch bottleneck).

        The key observation: with the batch sorted in processing order
        (ts, minpos, event_id), "advance every pending chain whose cursor ts
        <= event ts" collapses to a per-chain FIRST-CANDIDATE lookup — a
        chain whose step-p match sits at batch index j advances at step p+1
        on the first index i >= j (inclusive: the same event serves adjacent
        steps when its type holds both positions — the loop's
        ascending-positions rule) whose event serves p+1 on the same link.
        That lookup is one `np.searchsorted` over a composite
        (link_code * (N+1) + index) key array per step, vectorized across
        every chain awaiting that step; n_steps-1 rounds cover all chains
        since cursors only move forward. State chains (cursor from a prior
        batch) enter via ts: their starting index is
        `searchsorted(ts, cursor_ts)` — equivalent because the batch is
        ts-ascending and the loop's condition is `cursor_ts <= ts`.

        A chain whose first candidate fails the gap check stalls for the
        whole batch (later candidates are only farther in ts), exactly the
        loop's behavior of leaving it pending for horizon expiry. Expiry and
        the per-link TTL cap reproduce `finish()`: only links that saw
        events this batch expire/cap, horizons from each link's own batch-max
        ts, newest `state_ttl_rows` chains kept in pend order (state order,
        then E0 creation order).

        Takes and returns the FLAT state encoding (links/steps/flat_ts/
        flat_id) so decode/encode are repeat/cumsum gathers, not Python
        loops. Returns (out_links, out_ts_matrix, out_id_matrix,
        pend_links, pend_steps, pend_flat_ts, pend_flat_id).
        """
        S = len(st_steps)
        st_steps_a = np.asarray(st_steps, dtype=np.int64)
        st_links_a = np.asarray(list(st_links), dtype=object)
        N = 0 if batch is None else len(batch)
        if N == 0:
            # no events: nothing advances, no expiry (no link saw events)
            return (
                np.empty(0, dtype=object),
                np.empty((0, n_steps), np.int64),
                np.empty((0, n_steps), np.int64),
                st_links_a,
                st_steps_a,
                np.asarray(st_flat_ts, dtype=np.int64),
                np.asarray(st_flat_id, dtype=np.int64),
            )

        ts = batch["timestamp"].to_numpy(np.int64, copy=False)
        eid = batch["event_id"].to_numpy(np.int64, copy=False)
        blinks = batch["__link"].to_numpy(dtype=object, copy=False)

        # one link-code space across state chains + batch rows
        codes, uniques = pd.factorize(np.concatenate([st_links_a, blinks]))
        codes = codes.astype(np.int64, copy=False)
        n_codes = len(uniques)
        st_code = codes[:S]
        ev_code = codes[S:]

        # which batch rows serve which step position
        tcodes, tuniq = pd.factorize(batch["event_type"].to_numpy(dtype=object, copy=False))
        serves = np.zeros((len(tuniq), n_steps), dtype=bool)
        for ti, t in enumerate(tuniq):
            for p in positions[t]:
                serves[ti, p] = True

        BIG = np.int64(N + 1)
        idxs = np.arange(N, dtype=np.int64)
        cand_keys: list[np.ndarray] = []
        cand_idx: list[np.ndarray] = []
        for p in range(n_steps):
            m = serves[tcodes, p]
            ci = idxs[m]
            cl = ev_code[m]
            order = np.argsort(cl, kind="stable")  # (link, idx): idx already asc
            ci = ci[order]
            cand_keys.append(cl[order] * BIG + ci)
            cand_idx.append(ci)

        # chain matrices: state chains first (state order), then one chain
        # per step-0 event in processing order
        e0 = cand_idx[0] if n_steps else idxs[:0]
        # cand_idx[0] is sorted by (link, idx); chains are created in EVENT
        # order — re-sort by idx
        e0 = np.sort(e0)
        C = S + len(e0)
        ch_ts = np.zeros((C, n_steps), np.int64)
        ch_id = np.zeros((C, n_steps), np.int64)
        ch_len = np.zeros(C, np.int64)
        ch_link = np.empty(C, np.int64)
        ch_m = np.zeros(C, np.int64)  # min candidate batch index (inclusive)
        if S:
            off = np.concatenate([[0], np.cumsum(st_steps_a)])
            row = np.repeat(np.arange(S), st_steps_a)
            col = np.arange(off[-1], dtype=np.int64) - np.repeat(off[:-1], st_steps_a)
            ch_ts[row, col] = np.asarray(st_flat_ts, dtype=np.int64)
            ch_id[row, col] = np.asarray(st_flat_id, dtype=np.int64)
            ch_len[:S] = st_steps_a
            ch_link[:S] = st_code
            cursor = ch_ts[np.arange(S), st_steps_a - 1]
            ch_m[:S] = np.searchsorted(ts, cursor, side="left")
        if len(e0):
            ch_ts[S:, 0] = ts[e0]
            ch_id[S:, 0] = eid[e0]
            ch_len[S:] = 1
            ch_link[S:] = ev_code[e0]
            ch_m[S:] = e0
        stalled = np.zeros(C, dtype=bool)

        for p in range(1, n_steps):
            active = np.flatnonzero((ch_len == p) & ~stalled)
            if not len(active):
                continue
            keys = cand_keys[p]
            if not len(keys):
                stalled[active] = True
                continue
            target = ch_link[active] * BIG + ch_m[active]
            pos = np.searchsorted(keys, target, side="left")
            ok = pos < len(keys)
            safe = np.minimum(pos, len(keys) - 1)
            found = cand_idx[p][safe]
            hit = ok & (keys[safe] // BIG == ch_link[active])
            if max_gap_s is not None:
                hit &= ts[found] - ch_ts[active, p - 1] <= max_gap_s
            adv = active[hit]
            f = found[hit]
            ch_ts[adv, p] = ts[f]
            ch_id[adv, p] = eid[f]
            ch_len[adv] = p + 1
            ch_m[adv] = f
            stalled[active[~hit]] = True

        done = ch_len == n_steps
        comp = np.flatnonzero(done)
        out_links = uniques[ch_link[comp]] if len(comp) else np.empty(0, dtype=object)

        # pending: expiry + per-link TTL cap, only for links seen this batch
        pend = np.flatnonzero(~done)
        if len(pend):
            last = np.full(n_codes, np.iinfo(np.int64).min, dtype=np.int64)
            np.maximum.at(last, ev_code, ts)
            plink = ch_link[pend]
            seen = last[plink] != np.iinfo(np.int64).min
            if max_gap_s is not None:
                cur = ch_ts[pend, ch_len[pend] - 1]
                pend = pend[~(seen & (cur < last[plink] - max_gap_s))]
                plink = ch_link[pend]
                seen = last[plink] != np.iinfo(np.int64).min
            if len(pend):
                # cap: drop all but the newest state_ttl_rows chains per seen
                # link; pend is already in pend order (state, then creation)
                order = np.argsort(plink, kind="stable")
                sl = plink[order]
                counts = np.bincount(sl, minlength=n_codes)
                starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
                from_end = counts[sl] - (np.arange(len(sl)) - starts[sl])
                keep = ~seen[order] | (from_end <= state_ttl_rows)
                pend = np.sort(pend[order[keep]])  # restore pend order
        # encode grouped by link, link order = first appearance among
        # (state chains, then step-0 events) — the dict layout's key order
        if len(pend):
            first_seq = np.concatenate([st_code, ev_code[e0]])
            rank = np.full(n_codes, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(rank, first_seq, np.arange(len(first_seq), dtype=np.int64))
            order = np.argsort(rank[ch_link[pend]], kind="stable")
            pend = pend[order]
            plen = ch_len[pend]
            row = np.repeat(pend, plen)
            col_off = np.concatenate([[0], np.cumsum(plen)])
            col = np.arange(col_off[-1], dtype=np.int64) - np.repeat(col_off[:-1], plen)
            pend_links = uniques[ch_link[pend]]
            pend_steps = plen
            pend_flat_ts = ch_ts[row, col]
            pend_flat_id = ch_id[row, col]
        else:
            pend_links = np.empty(0, dtype=object)
            pend_steps = np.empty(0, np.int64)
            pend_flat_ts = np.empty(0, np.int64)
            pend_flat_id = np.empty(0, np.int64)
        return (
            out_links,
            ch_ts[comp],
            ch_id[comp],
            pend_links,
            pend_steps,
            pend_flat_ts,
            pend_flat_id,
        )

    out_fields = [T.StructField("link", T.StringType())]
    for i in range(n_steps):
        out_fields.append(T.StructField(f"s{i}_event_id", T.LongType()))
        out_fields.append(T.StructField(f"s{i}_timestamp", T.LongType()))
    out_schema = T.StructType(out_fields)
    out_cols = [f.name for f in out_fields]

    # Shared matching core for both grouping layouts. pend_by_link maps
    # link -> [(ts_hist, id_hist), ...] of incomplete chains (len(hist) =
    # steps matched, 1..n_steps-1); link_last_ts collects each link's max
    # batch ts (rows arrive ts-ascending) for the per-link expiry horizon.
    def process(
        rows,  # iterable of (link, ts, event_type, event_id), sorted
        pend_by_link: dict[str, list[tuple[list[int], list[int]]]],
        out: dict[str, list[Any]],
        link_last_ts: dict[str, int],
    ) -> None:
        for link, ts, etype, eid in rows:
            ts, eid = int(ts), int(eid)
            link_last_ts[link] = ts  # ascending within the link
            pend = pend_by_link.get(link)
            for pos in positions[etype]:
                if pos == 0:
                    if pend is None:
                        pend = pend_by_link[link] = []
                    pend.append(([ts], [eid]))
                    continue
                if not pend:
                    continue
                nxt: list[tuple[list[int], list[int]]] = []
                for ts_hist, id_hist in pend:
                    if (
                        len(ts_hist) == pos
                        and ts_hist[-1] <= ts
                        and (max_gap_s is None or ts - ts_hist[-1] <= max_gap_s)
                    ):
                        ts_hist = ts_hist + [ts]
                        id_hist = id_hist + [eid]
                        if len(ts_hist) == n_steps:  # complete: emit
                            out["link"].append(link)
                            for i in range(n_steps):
                                out[f"s{i}_event_id"].append(id_hist[i])
                                out[f"s{i}_timestamp"].append(ts_hist[i])
                            continue
                    nxt.append((ts_hist, id_hist))
                pend_by_link[link] = pend = nxt

    def finish(
        pend_by_link: dict[str, list[tuple[list[int], list[int]]]],
        link_last_ts: dict[str, int],
    ) -> None:
        """Per-link expiry (only links that saw events this batch, from
        their own batch-max horizon — never mid-batch) + per-link TTL cap."""
        for link, last in link_last_ts.items():
            pend = pend_by_link.get(link)
            if not pend:
                continue
            if max_gap_s is not None:
                horizon = last - max_gap_s
                pend = [p for p in pend if p[0][-1] >= horizon]
            if len(pend) > state_ttl_rows:  # bound memory on hot keys
                pend = pend[-state_ttl_rows:]
            if pend:
                pend_by_link[link] = pend
            else:
                del pend_by_link[link]

    def sorted_batch(pdfs: Iterator[pd.DataFrame]) -> pd.DataFrame | None:
        chunks = list(pdfs)
        if not chunks:
            return None
        batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        # earlier step positions first at equal ts (the single-link
        # matchers' A-before-B rule generalized); stable, so each link's
        # own events keep arrival order
        return batch.sort_values(["timestamp", "__minpos", "event_id"], kind="stable")

    def match_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        link = key[0]
        pend: list[tuple[list[int], list[int]]] = []
        if state.exists:
            steps, flat_ts, flat_id = state.get
            off = 0
            for s in steps:
                pend.append(
                    (list(flat_ts[off:off + s]), list(flat_id[off:off + s]))
                )
                off += s
        pend_by_link = {link: pend} if pend else {}
        out: dict[str, list[Any]] = {c: [] for c in out_cols}
        link_last_ts: dict[str, int] = {}
        batch = sorted_batch(pdfs)
        if batch is not None:
            process(
                zip(
                    (link for _ in range(len(batch))),
                    batch["timestamp"], batch["event_type"], batch["event_id"],
                ),
                pend_by_link, out, link_last_ts,
            )
        finish(pend_by_link, link_last_ts)
        pend = pend_by_link.get(link, [])
        if pend:
            state.update((
                [len(p[0]) for p in pend],
                [t for p in pend for t in p[0]],
                [i for p in pend for i in p[1]],
            ))
        elif state.exists:
            state.remove()
        if out["link"]:
            yield pd.DataFrame(out)

    def bucket_match_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            links, steps, flat_ts, flat_id = state.get
        else:
            links, steps, flat_ts, flat_id = (), (), (), ()
        batch = sorted_batch(pdfs)
        (
            out_links, out_ts, out_id,
            pend_links, pend_steps, pend_flat_ts, pend_flat_id,
        ) = _vector_chain_match(
            batch, links, steps, flat_ts, flat_id,
            n_steps, positions, max_gap_s, state_ttl_rows,
        )
        if len(pend_links):
            state.update((
                pend_links.tolist(),
                pend_steps.tolist(),
                pend_flat_ts.tolist(),
                pend_flat_id.tolist(),
            ))
        elif state.exists:
            state.remove()
        if len(out_links):
            out: dict[str, Any] = {"link": out_links}
            for i in range(n_steps):
                out[f"s{i}_event_id"] = out_id[:, i]
                out[f"s{i}_timestamp"] = out_ts[:, i]
            yield pd.DataFrame(out)

    minpos = F.lit(None).cast("int")
    for t, poss in positions.items():
        minpos = F.when(F.col("event_type") == t, F.lit(poss[0])).otherwise(minpos)
    sides = events.where(
        F.col("event_type").isin(list(positions)) & F.col(link_field).isNotNull()
    ).select(
        F.col(link_field).cast("string").alias("__link"),
        F.col("timestamp").cast("long").alias("timestamp"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        minpos.alias("__minpos"),
    )
    if key_buckets > 0:
        return (
            sides.withColumn(
                "__bucket", F.pmod(F.xxhash64("__link"), F.lit(key_buckets))
            )
            .groupBy("__bucket")
            .applyInPandasWithState(
                bucket_match_fn,
                outputStructType=out_schema,
                stateStructType=T.StructType([
                    T.StructField("links", T.ArrayType(T.StringType())),
                    T.StructField("steps", T.ArrayType(T.IntegerType())),
                    T.StructField("flat_ts", T.ArrayType(T.LongType())),
                    T.StructField("flat_id", T.ArrayType(T.LongType())),
                ]),
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
    return sides.groupBy("__link").applyInPandasWithState(
        match_fn,
        outputStructType=out_schema,
        stateStructType=T.StructType([
            T.StructField("steps", T.ArrayType(T.IntegerType())),
            T.StructField("flat_ts", T.ArrayType(T.LongType())),
            T.StructField("flat_id", T.ArrayType(T.LongType())),
        ]),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _sided(
    events: DataFrame, head_type: str, tail_type: str, link_field: str
) -> DataFrame:
    return events.where(
        F.col("event_type").isin([head_type, tail_type])
        & F.col(link_field).isNotNull()
    ).select(
        F.col(link_field).cast("string").alias("__link"),
        F.col("timestamp").cast("long").alias("timestamp"),
        F.col("event_id").cast("long").alias("event_id"),
        F.when(F.col("event_type") == head_type, F.lit(0))
        .otherwise(F.lit(1))
        .alias("__side"),
    )
