"""Benchmark entry point (driver contract).

Runs the headline flagship transcript pipeline plus the query suite over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``ray.init(address='local', num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints
ONE JSON line.

``--scaling``: runs the headline pipeline in two fresh processes at N and
4N CPUs (default 2 vs 8) on the same input — each pinned to exactly that
many host CPUs — and reports both throughputs plus the scaling
efficiency (the sandbox stand-in for the N vs 4N cluster criterion —
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get('GRAFT_SF_DIR', '/root/testdata/sf0.1')
NUM_CPUS = int(os.environ.get('RAY_GRAFT_CPUS', '32'))
# headline transcripts scale: ~2M turns at sf0.1
SF = float(SF_DIR.rstrip('/').rsplit('sf', 1)[-1]) if 'sf' in SF_DIR else 0.1
N_TURNS = int(os.environ.get('GRAFT_BENCH_TURNS', str(int(20_000_000 * SF))))

BENCH_QUERIES = [
    'q1_pricing_summary', 'q_top_customers', 'q_region_revenue',
    'q_priority_revenue', 'q_sessionize_events', 'q_lag_events',
    'q_ffill_events', 'q_asof_events', 'q_asof_events_stage',
    'q_rolling_events',
    'q_time_window_events', 'q_cumsum_events', 'q_rank_events',
    'q_melt_lineitem', 'q_pivot_lineitem',
    'q_exact_dedup_docs', 'q_ngram_jaccard_pairs', 'q_minhash_dedup_docs',
    'q_simhash_candidates_docs', 'q_token_stats', 'q_quality_scores',
    'q_repetition_scores', 'q_normalized_docs',
    'q_bpe_token_stats', 'q_langid_docs', 'q_ann_topk', 'q_ivf_topk',
    'q_cosine_pairs',
    'q_embedding_near_dup', 'q_embedding_dup_detect', 'q_tumbling_events',
    'q_hopping_events', 'q_top_docs_per_lang', 'q_value_quantiles',
    'q_hist_quantiles',
    'q_session_stats', 'q_distinct_users', 'q_hll_distinct_users',
    'q_struct_payload_events', 'q_partsupp_returns',
    'q_value_bands_events', 'q_session_paths_events',
    'q_quality_filter_docs', 'q_normalized_dedup_docs',
    'q_token_rarity_docs', 'q_priority_revenue_salted',
    'q_curate_docs', 'q_list_payload_embeddings', 'q_chunk_docs',
    'q_brand_revenue', 'q_cum_distinct_events', 'q_ewma_events',
    'q_distinct_pairs_events', 'q_intersect_users_events',
    'q_except_langs_docs', 'q_heavy_hitter_tokens',
    'q_user_value_stats', 'q_redact_docs', 'q_decontaminate_docs',
    'q_profile_events', 'q_returned_revenue', 'q_zscore_events',
    'q_window_positions_events', 'q_split_events', 'q_winsorize_events',
    'q_explode_embeddings', 'q_json_props_events', 'q_shipping_priority',
    'q_rollup_pricing', 'q_cube_docs', 'q_stratified_events',
    'q_late_events', 'q_corr_lineitem', 'q_mode_user_events',
    'q_centroids_embeddings', 'q_tfidf_docs',
    'q_media_embed', 'q_audio_energy',
    'q_mix_docs', 'q_pack_docs', 'q_shard_docs', 'q_token_budget_docs',
    'q_asof_forward_events', 'q_asof_nearest_events', 'q_latest_events',
    'q_regression_events', 'q_quantile_bins_events',
    'q_nearest_centroid_embeddings', 'q_time_range_join_events',
    'q_asof_broadcast_events', 'q_quarantine_audit_events',
    'q_outer_join_users',
    'q_editdist_pairs_docs', 'q_dup_spans_docs', 'q_dup_intervals_docs',
    'q_dedup_cut_docs', 'q_theta_users_overlap',
    'q_semi_join_customers', 'q_anti_join_customers',
    'q_first_last_events', 'q_funnel_events', 'q_retention_events',
    'q_paginate_events', 'q_fk_audit_star', 'q_pq_topk', 'q_ivfpq_topk',
    'q_target_encode_events', 'q_interp_events', 'q_mad_outliers_events',
    'q_pagerank_events', 'q_weighted_sample_docs', 'q_novelty_docs',
    'q_cms_token_counts',
    'q_feature_matrix_events', 'q_scd2_events', 'q_transitions_events',
    'q_bm25_docs', 'q_rolling_median_events', 'q_histogram_events',
    'q_pareto_users', 'q_attribution_events', 'q_pmi_bigrams_docs',
    'q_lm_score_docs', 'q_keywords_docs', 'q_ohlc_events',
    'q_burst_events', 'q_inverted_index_docs', 'q_ab_test_events',
    'q_item_cooc_events', 'q_groupkfold_events', 'q_gram_embeddings',
    'q_trend_events', 'q_quality_percentile_docs', 'q_twa_events',
    'q_assoc_rules_events', 'q_golden_record_events',
    'q_survival_users', 'q_drawdown_events', 'q_wow_growth_events',
    'q_xcorr_events', 'q_ks_drift_events',
    'q_entropy_users', 'q_gini_priority', 'q_rfm_users',
    'q_chi2_events', 'q_benford_orders', 'q_snm_pairs_docs',
    'q_triangles_embeddings', 'q_cusum_events', 'q_rrf_fusion',
    'q_clustering_embeddings', 'q_assortativity_embeddings',
    'q_kcore_embeddings', 'q_rank_nulls_events',
    'q_kmeans_embeddings', 'q_seasonal_events', 'q_wilson_events',
    'q_dl_pairs_docs', 'q_lpa_embeddings',
    'q_concurrent_sessions_events', 'q_nfc_docs',
    'q_dbscan_embeddings', 'q_bpe_train_docs', 'q_bpe_encode_docs',
    'q_bfs_embeddings', 'q_class_balance_docs', 'q_dup_events_events',
    'q_kanon_docs', 'q_containment_pairs', 'q_storm_sessions_events',
    'q_semdedup_embeddings', 'q_conv_exact_dedup', 'q_conv_minhash_dedup',
    'q_mmr_topk', 'q_jw_pairs_docs',
]


def _tune(ctx):
    """Measured on this box (BASELINE.md): push-based sort shuffle beats
    pull-based and hash shuffles for the bucket exchange, and 512 MiB
    blocks beat the 128 MiB default ~2x at 10M rows (fewer tasks, less
    per-task overhead; 512 MiB x workers must fit the heap — scale down
    on smaller nodes)."""
    from ray.data.context import ShuffleStrategy
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    ctx.target_max_block_size = 512 * 1024 * 1024
    # Ray 2.49's groupby().map_groups emits schema-less EMPTY blocks for
    # empty sort partitions without calling the UDF (reproducible with a
    # vanilla two-column example), which triggers a spurious
    # "different schema ... new schema: ." warning per empty partition.
    # Cosmetic and Ray-internal — silence just that logger.
    import logging
    logging.getLogger(
        'ray.data._internal.execution.streaming_executor_state'
    ).setLevel(logging.ERROR)


def _buckets() -> int:
    """Exchange bucket count: ~30k rows per bucket task, clamped to
    [64, 8 x CPUs] — reproduces the measured optima at both 2M turns
    (64-66 buckets, 1.37M rows/s) and 10M turns (256 buckets,
    1.6M rows/s) on this VM."""
    return min(max(8 * NUM_CPUS, 64), max(64, N_TURNS // 30000))


def transcripts_path() -> str:
    """Cache the deterministic transcripts input under /tmp (sharded
    parquet); warm the page cache with one untimed read."""
    from trafaret_ray.sources.transcripts import write_transcripts
    path = f'/tmp/trafaret_ray_bench/transcripts_{N_TURNS}'
    marker = os.path.join(path, '_DONE')
    if not os.path.exists(marker):
        write_transcripts(path, n_turns=N_TURNS, seed=42,
                          malformed_frac=0.02)
        open(marker, 'w').write('ok')
    for f in os.listdir(path):
        if f.endswith('.parquet'):
            with open(os.path.join(path, f), 'rb') as fh:
                fh.read()
    return path


def _read_blocks(path: str) -> int | None:
    """Size-aware block count for the transcripts read: ~5 MiB
    compressed per block (measured optimum at 2M turns: 8 blocks over
    41 MB = 1.67M rows/s vs 1.40M at Ray's 64-way default split).
    Disengages (None) beyond 64 computed blocks so big inputs keep
    Ray's own size-based splitting — same policy as queries._read."""
    total = sum(os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path) if f.endswith('.parquet'))
    est = max(1, total // (5 << 20))
    return int(est) if est < 64 else None


def run_headline() -> dict:
    import ray
    import ray.data as rd
    from ray.data import DataContext
    ray.init(address='local', num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level='ERROR')
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    _tune(ctx)
    path = transcripts_path()

    from trafaret_ray.pipelines.flagship import flagship
    _warmup(path)
    # best-of-3: run-to-run variance on this VM is large (BASELINE.md);
    # CLAUDE.md makes warm-up + best-of-N mandatory for any timing
    headline_sec, n_rows = None, 0
    nb = _read_blocks(path)
    for _ in range(3):
        t0 = time.perf_counter()
        ds = rd.read_parquet(path, override_num_blocks=nb)
        feats, _q = flagship(ds, num_buckets=_buckets())
        n_rows = 0
        for b in feats.iter_batches(batch_size=None, batch_format='pyarrow'):
            n_rows += b.num_rows
        sec = time.perf_counter() - t0
        headline_sec = sec if headline_sec is None else min(headline_sec,
                                                           sec)

    qtimes = {}
    import __ray_entry__ as entrymod
    queries = entrymod.queries()
    # one untimed query warms the worker-side import of the query module
    # (steady-state measurement; same rationale as _warmup)
    queries['q1_pricing_summary'](SF_DIR).to_pandas()
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        res = queries[name](SF_DIR)
        if hasattr(res, 'to_pandas'):
            res.to_pandas()
        qtimes[name] = round(time.perf_counter() - t0, 3)
    ray.shutdown()
    return {'headline_sec': headline_sec, 'rows': n_rows, 'queries': qtimes}


def main():
    if '--scaling' in sys.argv:
        # N vs 4N parallelism levels. Default 2 vs 8: the span inside
        # this host's near-linear hardware region (the raw CPU probe
        # scales at 0.91 over 2->8 procs but saturates beyond ~8-16 —
        # BASELINE.md round 3), so software efficiency is measured
        # against hardware that can actually serve both legs.
        lo = int(os.environ.get('GRAFT_SCALE_LO', '2'))
        hi = int(os.environ.get('GRAFT_SCALE_HI', str(lo * 4)))
        # Pin each leg's WHOLE process tree (workers + raylet + object
        # store + driver) to exactly N host CPUs: at num_cpus=N Ray's
        # helper threads otherwise burn cores beyond the budget, which
        # inflates the small leg and understates scaling. A pinned run
        # is the faithful stand-in for an N-node vs 4N-node cluster,
        # where a node's budget bounds EVERYTHING on it.
        pin = os.environ.get('GRAFT_SCALE_PIN', '1') == '1'
        results = {}
        for ncpu in (lo, hi):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_BENCH_HEADLINE_ONLY='1',
                       PYTHONPATH='/root/repo')
            # 20M-turn input for scaling runs: amortizes the ~5 s fixed
            # per-stage cost (measured via T = f + c/N fit) so software
            # scaling dominates the measurement
            env.setdefault('GRAFT_BENCH_TURNS', '20000000')
            cmd = [sys.executable, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), 'bench.py')]
            if pin:
                cmd = ['taskset', '-c', f'0-{ncpu - 1}'] + cmd
            out = subprocess.run(
                cmd, env=env, capture_output=True, text=True,
                check=True).stdout
            results[ncpu] = json.loads(out.strip().splitlines()[-1])
        tplo = results[lo]['rows_per_sec']
        tphi = results[hi]['rows_per_sec']
        eff = (tphi / tplo) / (hi / lo)
        print(json.dumps({
            f'sec_{lo}': results[lo]['value'],
            f'sec_{hi}': results[hi]['value'],
            f'turns_per_sec_{lo}': tplo, f'turns_per_sec_{hi}': tphi,
            'cpus_lo': lo, 'cpus_hi': hi, 'pinned': pin,
            'scaling_efficiency': round(eff, 3),
            'n_turns': results[hi].get('rows', N_TURNS),
        }))
        return

    headline_only = os.environ.get('GRAFT_BENCH_HEADLINE_ONLY') == '1'
    r = run_headline() if not headline_only else _headline_only()
    out = {
        'metric': 'flagship_transcript_features_e2e',
        'value': round(r['headline_sec'], 3),
        'unit': 'sec',
        'queries': r.get('queries', {}),
        'sf': SF,
        'num_cpus': NUM_CPUS,
        'rows': r['rows'],
        'rows_per_sec': round(r['rows'] / r['headline_sec'], 1),
    }
    print(json.dumps(out))


def _warmup(path):
    """Untimed warm-up: spins up the worker pool and pays the per-worker
    module-import cost once, so the timed run measures compute + shuffle
    (the steady-state a long-running cluster job sees)."""
    import ray.data as rd
    from trafaret_ray.pipelines.flagship import flagship
    first = sorted(p for p in os.listdir(path) if p.endswith('.parquet'))[0]
    feats, _ = flagship(rd.read_parquet(os.path.join(path, first)),
                        num_buckets=_buckets())
    for _ in feats.iter_batches(batch_size=None, batch_format='pyarrow'):
        pass


def _headline_only() -> dict:
    """Timed flagship run with the production sink (parallel
    write_parquet — a driver-side iter_batches pull would serialize the
    measurement). Best of 2 to damp hypervisor noise."""
    import shutil
    import ray
    import ray.data as rd
    from ray.data import DataContext
    ray.init(address='local', num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level='ERROR')
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    _tune(ctx)
    path = transcripts_path()
    from trafaret_ray.pipelines.flagship import flagship
    _warmup(path)
    out_dir = f'/tmp/trafaret_ray_bench/out_{NUM_CPUS}'
    best, n_rows = None, 0
    nb = _read_blocks(path)
    for _ in range(3):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ds = rd.read_parquet(path, override_num_blocks=nb)
        feats, _q = flagship(ds, num_buckets=_buckets())
        feats.write_parquet(out_dir)
        sec = time.perf_counter() - t0
        best = sec if best is None else min(best, sec)
    n_rows = rd.read_parquet(out_dir).count()
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()
    return {'headline_sec': best, 'rows': n_rows}


if __name__ == '__main__':
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
