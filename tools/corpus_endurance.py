"""Document-corpus endurance run: the dedup family at ~1M docs.

Generates a deterministic synthetic corpus shaped like the driver's
documents table (word-soup text over a small vocabulary, 5 langs, ~5%
planted near/exact dups — same statistical shape as
/root/testdata/sf*/documents.parquet, scaled up), writes it as
multi-row-group parquet under /tmp, then streams the substring-dedup
and curation pipelines over it end-to-end, printing one JSON line of
throughputs. Nothing materializes driver-side in the measured paths.

Usage: PYTHONPATH=/root/repo python tools/corpus_endurance.py [n_docs]
"""
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# 20k-word Zipfian vocabulary: real corpora are heavy-tailed — a tiny
# flat vocab makes EVERY shingle a stop-shingle and benchmarks the
# degenerate case instead of the product case
VOCAB = np.array([f'w{i}' for i in range(20_000)])
ZIPF_A = 1.3
LANGS = np.array(['en', 'de', 'es', 'fr', 'zh'])


def generate(path: str, n_docs: int, seed: int = 7,
             chunk: int = 100_000) -> None:
    from trafaret_ray.functions.text import _LANG_STOPWORDS
    rng = np.random.default_rng(seed)
    with pq.ParquetWriter(path, pa.schema([
            ('doc_id', pa.int64()), ('text', pa.string()),
            ('lang', pa.string()), ('source', pa.string()),
            ('n_chars', pa.int64())])) as w:
        for lo in range(0, n_docs, chunk):
            n = min(chunk, n_docs - lo)
            lens = rng.integers(20, 80, size=n)
            lang_idx = rng.integers(0, 5, size=n)
            total = int(lens.sum())
            # Zipfian word draw (rejection-free: zipf then clip tail)
            words = np.minimum(rng.zipf(ZIPF_A, size=total) - 1,
                               len(VOCAB) - 1)
            toks = VOCAB[words].astype(object)
            # ~15% of each doc's tokens are its language's stopwords so
            # the stopword-voting language gate sees real signal (the
            # driver's testdata corpus has the same property)
            sw = {lg: np.array(sorted(ws), dtype=object)
                  for lg, ws in _LANG_STOPWORDS.items()}
            doc_of = np.repeat(np.arange(n), lens)
            doc_lang = LANGS[lang_idx]
            hit = rng.random(total) < 0.15
            for lg, pool in sw.items():
                m = hit & (doc_lang[doc_of] == lg)
                toks[m] = pool[rng.integers(0, len(pool), size=int(m.sum()))]
            offs = np.cumsum(lens) - lens
            texts = [' '.join(toks[offs[d]:offs[d] + lens[d]])
                     for d in range(n)]
            # ~5% planted dups: copy a doc from earlier in the chunk
            dup = rng.random(n) < 0.05
            src = rng.integers(0, n, size=n)
            for d in np.nonzero(dup)[0]:
                texts[d] = texts[src[d]]
            tbl = pa.table({
                'doc_id': pa.array(np.arange(lo, lo + n), pa.int64()),
                'text': pa.array(texts),
                'lang': pa.array(LANGS[lang_idx]),
                'source': pa.array([f'src{i}' for i in
                                    rng.integers(0, 8, size=n)]),
                'n_chars': pa.array(
                    np.fromiter((len(t) for t in texts), np.int64, n)),
            })
            w.write_table(tbl, row_group_size=25_000)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    path = f'/tmp/corpus_endurance_{n_docs}.parquet'
    sf_dir = os.path.dirname(path)
    if not os.path.exists(path):
        t0 = time.time()
        generate(path, n_docs)
        print(f'generated {n_docs} docs in {time.time()-t0:.1f}s '
              f'({os.path.getsize(path)>>20} MiB)', file=sys.stderr)

    import ray
    if not ray.is_initialized():
        ray.init(address='local',
                 num_cpus=int(os.environ.get('RAY_GRAFT_CPUS', '32')),
                 include_dashboard=False, logging_level='ERROR')
    import ray.data as rd
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    out = {'n_docs': n_docs, 'mib': os.path.getsize(path) >> 20}
    # reduce width tracks exchange volume: 128 buckets measured 25-35%
    # faster than 32 on the ~50M-row/M-doc gram exchange at both 1M and
    # 4M docs (BASELINE.md)
    nb = 128 if n_docs >= 1_000_000 else 32

    def read():
        return rd.read_parquet(path)

    # substring-dedup spans: gram explode + ONE gram-hash exchange
    from trafaret_ray.functions.text import shingle_hash_explode
    from trafaret_ray.stages.conversations import bucket_exchange
    import pyarrow.compute as pc

    def grams(tbl):
        ids = tbl.column('doc_id').to_numpy(zero_copy_only=False)
        lengths, gd, gh = shingle_hash_explode(tbl.column('text'), 8,
                                               distinct=False)
        starts = np.cumsum(lengths) - lengths
        pos = np.arange(len(gd), dtype=np.int64) - starts[gd] + 1
        return pa.table({'doc_id': pa.array(ids[gd], pa.int64()),
                         'pos': pa.array(pos, pa.int64()),
                         'gh': pa.array(gh.view(np.int64), pa.int64())})

    def dup_only(tbl):
        gh = tbl.column('gh').combine_chunks().to_numpy(
            zero_copy_only=False)
        _, inv, cnt = np.unique(gh, return_inverse=True,
                                return_counts=True)
        return tbl.filter(pa.array(cnt[inv] >= 2))\
            .select(['doc_id', 'pos'])

    t0 = time.time()
    g = read().map_batches(grams, batch_format='pyarrow',
                           zero_copy_batch=True)
    n_spans = bucket_exchange(g, 'gh', dup_only, num_buckets=nb).count()
    dt = time.time() - t0
    out['dup_spans_sec'] = round(dt, 2)
    out['dup_spans_docs_per_sec'] = int(n_docs / dt)
    out['n_dup_spans'] = n_spans

    # exact dedup (fingerprint exchange)
    from trafaret_ray.stages.dedup import exact_dedup
    t0 = time.time()
    n_exact = exact_dedup(read()).count()
    dt = time.time() - t0
    out['exact_dedup_sec'] = round(dt, 2)
    out['exact_dedup_docs_per_sec'] = int(n_docs / dt)
    out['n_exact_groups'] = n_exact

    # minhash near-dup clustering (LSH index + distributed verify + CC)
    from trafaret_ray.stages.dedup import minhash_dedup
    t0 = time.time()
    n_clustered = minhash_dedup(read(), threshold=0.7,
                                num_buckets=nb).count()
    dt = time.time() - t0
    out['minhash_dedup_sec'] = round(dt, 2)
    out['minhash_dedup_docs_per_sec'] = int(n_docs / dt)
    out['n_clustered_docs'] = n_clustered

    # full curation composition (normalize -> gates -> exact -> near);
    # GRAFT_CURATE_HASH_MODE=duckdb probes the ORACLE-CHECKED config
    # (DuckDB-parity murmur chains) — the r4 1M-doc A/B showed it costs
    # nothing; the r5 4M record runs it as the config of record
    from trafaret_ray.pipelines.curation import curate_documents
    hm = os.environ.get('GRAFT_CURATE_HASH_MODE', 'pandas')
    t0 = time.time()
    n_curated = curate_documents(read(), num_buckets=nb,
                                 hash_mode=hm).count()
    dt = time.time() - t0
    out['curate_hash_mode'] = hm
    out['curate_sec'] = round(dt, 2)
    out['curate_docs_per_sec'] = int(n_docs / dt)
    out['n_curated'] = n_curated

    print(json.dumps(out))
    ray.shutdown()


if __name__ == '__main__':
    main()
