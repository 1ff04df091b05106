"""End-to-end LLM training-data curation pipeline: the composition a
100-TB corpus actually runs, chaining the engine's curation operators
with the minimum shuffle budget.

    normalize (map) → language filter (map) → quality gate (map)
      → exact dedup on normalized text (one partial exchange + semi join)
      → MinHash-LSH near-dedup, keep cluster canonicals (LSH index
        exchange + distributed verify + anti join)

Each stage is the already-tested operator; this module only wires them.
Shuffle budget: one fingerprint-partial exchange + the LSH index
exchange — the raw text crosses the wire zero times after the read.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def curate_documents(ds, id_col: str = 'doc_id', text_col: str = 'text',
                     langs=('en', 'de', 'es'), min_words: int = 5,
                     near_threshold: float = 0.7, num_buckets: int = 32,
                     hash_mode: str = 'pandas'):
    """corpus Dataset → curated Dataset (id, text_norm, lang, n_words).

    Kept rows: detected language in ``langs``, at least ``min_words``
    whitespace tokens after normalization, first (min id) per exact
    normalized duplicate group, and first per near-duplicate cluster at
    ``near_threshold`` jaccard. Deterministic end-to-end (fixed LSH
    seeds), so reruns are byte-identical."""
    from ..functions.text import (language_id, normalize_text,
                                  whitespace_token_count)
    from ..stages.dedup import exact_dedup, minhash_dedup
    from ..stages.joins import anti_join, semi_join

    def clean(tbl: pa.Table) -> pa.Table:
        norm = normalize_text(tbl.column(text_col).combine_chunks())
        lang, _conf = language_id(norm)
        nw = whitespace_token_count(norm)
        out = pa.table({
            id_col: tbl.column(id_col),
            'text_norm': norm,
            'lang': pa.array(lang),
            'n_words': pc.cast(nw, pa.int64()),
        })
        keep = pc.and_(
            pc.is_in(out.column('lang'),
                     value_set=pa.array(list(langs))),
            pc.greater_equal(out.column('n_words'),
                             pa.scalar(min_words, type=pa.int64())))
        return out.filter(keep)

    # cleaned feeds TWO consumers (the dedup census and the semi join)
    # and exact_unique feeds several executions inside minhash_dedup —
    # Ray re-derives lazy datasets per consumer, so normalize+langid
    # would otherwise run 4-5x. Materialize once into the object store
    # (spillable); a 100-TB run checkpoints these stage outputs to
    # parquet instead (state/checkpoint.py), same shape.
    cleaned = ds.map_batches(clean, batch_format='pyarrow',
                             zero_copy_batch=True).materialize()

    # exact dedup on the normalized text: canonical = min id per
    # distinct content. stages/dedup.exact_dedup exchanges 8-byte
    # fingerprint partials, NOT the text itself — at 100 TB the full
    # corpus must never ride an exchange just to find duplicates (a
    # 64-bit content hash stands in for text equality, the same
    # documented collision tradeoff as q_exact_dedup_docs).
    # the empty-block fallbacks must carry the CORPUS id type (string
    # ids are legal) — a hardcoded int64 empty block would disagree
    # with sibling blocks and fail unification nondeterministically.
    # ``ds`` is the caller's INPUT dataset, so .schema() is free
    # (parquet metadata), never a derived execution.
    in_schema = ds.schema()
    id_type = (dict(zip(in_schema.names, in_schema.types))[id_col]
               if in_schema is not None else pa.int64())

    canon = exact_dedup(cleaned, text_col='text_norm', id_col=id_col)
    ids_only = canon.map_batches(lambda t: t.select([id_col])
                                 if id_col in t.column_names else
                                 pa.table({id_col: pa.array([],
                                                            id_type)}),
                                 batch_format='pyarrow')
    exact_unique = semi_join(cleaned, ids_only, id_col).materialize()

    # near-dedup over the exact-unique survivors: drop every cluster
    # member except the canonical. The LSH/graph machinery keys on
    # int64 node ids (stages/dedup.py, stages/graph.py) — integer
    # corpora pass ids through; any other id type rides a deterministic
    # 64-bit surrogate (`pd.util.hash_array` of the id), the same 2^-64
    # collision tradeoff as the exact-dedup fingerprint, and the kept
    # canonical becomes "min surrogate" (deterministic, arbitrary).
    if pa.types.is_integer(id_type):
        near_in, near_id = exact_unique, id_col
    else:
        import pandas as pd

        def add_sid(tbl: pa.Table) -> pa.Table:
            sid = pd.util.hash_array(
                tbl.column(id_col).to_numpy(zero_copy_only=False),
                categorize=False).view(np.int64)
            return tbl.append_column('_sid', pa.array(sid, pa.int64()))

        near_in = exact_unique.map_batches(add_sid, batch_format='pyarrow',
                                           zero_copy_batch=True)
        near_id = '_sid'
    clusters = minhash_dedup(near_in, text_col='text_norm',
                             id_col=near_id, threshold=near_threshold,
                             num_buckets=num_buckets,
                             hash_mode=hash_mode)
    near_id_type = id_type if near_id == id_col else pa.int64()

    def non_canon(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or near_id not in tbl.column_names:
            return pa.table({near_id: pa.array([], near_id_type)})
        keep = pc.not_equal(tbl.column(near_id),
                            tbl.column('cluster_id'))
        return tbl.filter(keep).select([near_id])

    drop_ids = clusters.map_batches(non_canon, batch_format='pyarrow')
    kept = anti_join(near_in, drop_ids, near_id)
    if near_id == id_col:
        return kept
    return kept.map_batches(
        lambda t: t.drop_columns(['_sid']) if '_sid' in t.column_names
        else t, batch_format='pyarrow')
