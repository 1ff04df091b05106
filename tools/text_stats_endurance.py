"""Text-statistics endurance run: the corpus-model query family
(BM25, bigram-LM scoring, keyword extraction, inverted index, PMI
collocations) at 100k-1M docs.

Reuses corpus_endurance's deterministic Zipf corpus (large heavy-tailed
vocab — the product case, not the stop-shingle degenerate case), laid
out as {dir}/documents.parquet so the probe exercises the EXACT
queries() entry points end-to-end. One JSON line of per-path
throughput. The sf-scale suite cannot see these costs: the bigram
census is ~50 rows/doc and the hot-context buckets only show their
skew beyond ~100k docs.

Usage: PYTHONPATH=/root/repo python tools/text_stats_endurance.py [n_docs]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
from corpus_endurance import generate  # noqa: E402


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    sf_dir = f'/tmp/text_endurance_{n_docs}'
    os.makedirs(sf_dir, exist_ok=True)
    path = f'{sf_dir}/documents.parquet'
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
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from trafaret_ray.pipelines import queries as Q

    # GRAFT_LM_HOT_CTX forces the lm_score salted hot-context tier at
    # a given row threshold (A/B: the Zipf head is ~7% of bigram rows,
    # under the 4M default until ~1.2M docs)
    hot_ctx = os.environ.get('GRAFT_LM_HOT_CTX')
    lm_fn = (lambda d: Q.q_lm_score_docs(d, hot_ctx_rows=int(hot_ctx))) \
        if hot_ctx else Q.q_lm_score_docs

    out = {'n_docs': n_docs, 'mib': os.path.getsize(path) >> 20}
    if hot_ctx:
        out['lm_hot_ctx_rows'] = int(hot_ctx)
    paths = [
        ('bm25', Q.q_bm25_docs),
        ('lm_score', lm_fn),
        ('keywords', Q.q_keywords_docs),
        ('inverted_index', Q.q_inverted_index_docs),
        ('pmi_bigrams', Q.q_pmi_bigrams_docs),
        ('bpe_train', Q.q_bpe_train_docs),
        ('bpe_encode', Q.q_bpe_encode_docs),
    ]
    for name, fn in paths:
        t0 = time.time()
        import pandas as pd
        r = fn(sf_dir)
        n_rows = len(r) if isinstance(r, pd.DataFrame) else r.count()
        dt = time.time() - t0
        out[f'{name}_sec'] = round(dt, 2)
        out[f'{name}_docs_per_sec'] = int(n_docs / dt)
        out[f'{name}_rows'] = int(n_rows)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == '__main__':
    main()
