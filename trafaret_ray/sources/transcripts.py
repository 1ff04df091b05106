"""Deterministic synthetic transcripts source (FIXTURES.md §A).

The north rule's input is a Parquet table of multi-turn conversation /
agent transcripts with columns exactly per ``input_hint``:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string (nullable), ts:timestamp[us]

This generator is seeded and fully vectorized (numpy), with the knobs the
fixtures require: long-tail conversation sizes with mega-conversations (to
exercise skew salting), session gaps above/below the sessionization
threshold, duplicate timestamps within a conversation (tie-break by
turn_idx must stay stable), and malformed-row injection with exactly one
defect per bad row (quarantine expectations in FIXTURES.md §A.1).

No external data — everything derives from the seed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(['user', 'assistant', 'system', 'tool'])
TOOLS = np.array(['search', 'browser', 'python', 'calculator', 'retrieval'])

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min — the flagship's gap threshold

_WORDS = np.array([
    'alpha', 'bravo', 'charlie', 'delta', 'echo', 'foxtrot', 'golf',
    'hotel', 'india', 'juliet', 'kilo', 'lima', 'mike', 'november',
    'oscar', 'papa', 'quebec', 'romeo', 'sierra', 'tango', 'uniform',
    'victor', 'whiskey', 'xray', 'yankee', 'zulu',
])


def conv_sizes(n_turns: int, rng: np.random.Generator,
               mega_frac: float = 0.001, mega_factor: int = 100) -> np.ndarray:
    """Long-tail (lognormal) turn counts summing to ~n_turns, with a few
    mega-conversations ≥ mega_factor × median."""
    median = 12
    sizes = []
    total = 0
    while total < n_turns:
        chunk = np.maximum(
            2, rng.lognormal(mean=np.log(median), sigma=0.9,
                             size=4096).astype(np.int64))
        mega = rng.random(4096) < mega_frac
        chunk[mega] *= mega_factor
        sizes.append(chunk)
        total += int(chunk.sum())
    sizes = np.concatenate(sizes)
    cum = np.cumsum(sizes)
    cut = int(np.searchsorted(cum, n_turns)) + 1
    return sizes[:cut]


def generate_table(n_turns: int = 10_000, seed: int = 42,
                   malformed_frac: float = 0.0,
                   start_conv: int = 0) -> pa.Table:
    """One deterministic transcripts table. ``start_conv`` offsets conv ids
    so sharded generation produces disjoint conversations."""
    rng = np.random.default_rng(seed + start_conv)
    sizes = conv_sizes(n_turns, rng)
    n_convs = len(sizes)
    n = int(sizes.sum())

    conv_ord = np.repeat(np.arange(n_convs, dtype=np.int64), sizes)
    conv_id = np.char.add('c-', np.char.zfill(
        (conv_ord + start_conv).astype('U12'), 9))
    ends = np.cumsum(sizes)
    starts_at = ends - sizes
    turn_idx = (np.arange(n, dtype=np.int64) - starts_at[conv_ord]).astype(np.int32)

    # roles: mostly alternating user/assistant; occasional system at turn 0,
    # tool turns sprinkled in
    role_pick = rng.random(n)
    role = np.where(turn_idx % 2 == 0, 'user', 'assistant').astype('U9')
    role[(turn_idx == 0) & (role_pick < 0.15)] = 'system'
    tool_rows = (turn_idx > 1) & (role_pick > 0.88)
    role[tool_rows] = 'tool'
    tool = np.where(tool_rows, TOOLS[rng.integers(0, len(TOOLS), n)], None)

    # timestamps: per-conv start + cumulative gaps; ~4% of intra-conv gaps
    # exceed the session threshold; ~2% duplicate the previous ts exactly
    base = np.int64(1_700_000_000_000_000)  # 2023-11 in us
    conv_start = base + rng.integers(0, 90 * 24 * 3600, n_convs) * 1_000_000
    gaps = rng.integers(1, 180, n) * 1_000_000  # 1s..3min
    gap_kind = rng.random(n)
    gaps[gap_kind < 0.04] = SESSION_GAP_US + rng.integers(
        1, 3600, (gap_kind < 0.04).sum()) * 1_000_000
    gaps[(gap_kind >= 0.04) & (gap_kind < 0.06)] = 0  # duplicate ts
    gaps[turn_idx == 0] = 0
    cum = np.cumsum(gaps)
    cum = cum - cum[starts_at[conv_ord]]
    ts = conv_start[conv_ord] + cum

    # text: deterministic multi-word strings (vectorized join of word picks)
    w = _WORDS[rng.integers(0, len(_WORDS), (n, 4))]
    text = np.char.add(np.char.add(np.char.add(np.char.add(
        w[:, 0], ' '), w[:, 1]), ' '), np.char.add(w[:, 2],
        np.char.add(' ', w[:, 3])))
    text = np.char.add(text, np.char.add(' #', turn_idx.astype('U10')))

    tbl = pa.table({
        'conv_id': pa.array(conv_id, type=pa.string()),
        'turn_idx': pa.array(turn_idx, type=pa.int32()),
        'role': pa.array(role, type=pa.string()),
        'text': pa.array(text, type=pa.string()),
        'tool': pa.array(tool, type=pa.string()),
        'ts': pa.array(ts, type=pa.timestamp('us')),
    })
    if malformed_frac > 0:
        tbl = _inject_malformed(tbl, rng, malformed_frac)
    return tbl


def _inject_malformed(tbl: pa.Table, rng: np.random.Generator,
                      frac: float) -> pa.Table:
    """Inject single-defect bad rows (FIXTURES.md §A.1). Defects that keep
    the Arrow schema valid: empty conv_id, negative turn_idx, unknown role,
    tool set while role != 'tool', null ts, null text."""
    n = tbl.num_rows
    bad = np.nonzero(rng.random(n) < frac)[0]
    if len(bad) == 0:
        return tbl
    kind = rng.integers(0, 6, len(bad))
    cols = {name: tbl.column(name).combine_chunks().to_numpy(
        zero_copy_only=False).copy() for name in
        ('conv_id', 'role', 'text', 'tool')}
    turn = tbl.column('turn_idx').combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.int64).copy()
    ts = tbl.column('ts').combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False).copy()
    ts_null = np.zeros(n, dtype=bool)
    text_null = np.zeros(n, dtype=bool)
    for i, k in zip(bad, kind):
        if k == 0:
            cols['conv_id'][i] = ''
        elif k == 1:
            turn[i] = -1 - int(turn[i])
        elif k == 2:
            cols['role'][i] = 'robot'
            # exactly ONE defect per bad row (FIXTURES.md §A.1): on a
            # tool row, leaving tool set would also trip tool_iff_role
            cols['tool'][i] = None
        elif k == 3:
            cols['role'][i] = 'user'
            cols['tool'][i] = 'search'
        elif k == 4:
            ts_null[i] = True
        else:
            text_null[i] = True
    return pa.table({
        'conv_id': pa.array(cols['conv_id'], type=pa.string()),
        'turn_idx': pa.array(turn.astype(np.int32), type=pa.int32()),
        'role': pa.array(cols['role'], type=pa.string()),
        'text': pa.array(cols['text'], mask=text_null, type=pa.string()),
        'tool': pa.array(cols['tool'], type=pa.string()),
        'ts': pa.array(ts, mask=ts_null, type=pa.int64()).cast(
            pa.timestamp('us')),
    })


def write_transcripts(path: str, n_turns: int = 100_000, seed: int = 42,
                      malformed_frac: float = 0.02,
                      rows_per_file: int = 250_000) -> list[str]:
    """Sharded parquet layout (one file per shard → resumable inputs).
    Shards are independent conv-id ranges, so generation is
    embarrassingly parallel at any scale."""
    import os
    os.makedirs(path, exist_ok=True)
    files = []
    written = 0
    shard = 0
    # rough conv offset spacing so shards never collide
    conv_stride = max(1, rows_per_file // 6) * 4
    while written < n_turns:
        chunk = min(rows_per_file, n_turns - written)
        tbl = generate_table(chunk, seed=seed, malformed_frac=malformed_frac,
                             start_conv=shard * conv_stride)
        f = os.path.join(path, f'part-{shard:05d}.parquet')
        pq.write_table(tbl, f)
        files.append(f)
        written += tbl.num_rows
        shard += 1
    return files


TRANSCRIPT_SCHEMA = pa.schema([
    ('conv_id', pa.string()),
    ('turn_idx', pa.int32()),
    ('role', pa.string()),
    ('text', pa.string()),
    ('tool', pa.string()),
    ('ts', pa.timestamp('us')),
])


def transcript_contract():
    """The flagship's declarative gate (SURVEY.md §7 phase 0/1):
    reference-style Dict over the input_hint schema, including the
    cross-field invariant tool IS SET iff role == 'tool'."""
    import pyarrow.compute as pc
    import trafaret_ray.contracts as t
    from trafaret_ray.contracts.result import CheckResult
    from trafaret_ray.contracts.scalars import _np_mask

    def tool_iff_role(cols):
        role = cols['role']
        tool = cols.get('tool')
        if tool is None:
            tool = pa.nulls(len(role), type=pa.string())
        ok = _np_mask(pc.equal(pc.equal(role, 'tool'), pc.is_valid(tool)))
        return CheckResult.from_mask(tool, ok, 'tool_role_mismatch',
                                     "tool must be set iff role is 'tool'")

    return t.Dict(
        t.Key('conv_id', contract=t.String()),
        t.Key('turn_idx', contract=t.Int(gte=0)),
        t.Key('role', contract=t.Enum('user', 'assistant', 'system', 'tool')),
        t.Key('text', contract=t.String(allow_blank=True)),
        t.Key('ts', contract=t.DateTime()),
        t.subdict('tool', t.Key('role'),
                  t.Key('tool', optional=True,
                        contract=t.Null() | t.String()),
                  contract=tool_iff_role, vectorized=True),
    )
