"""File-level incremental ingest: only unseen input shards are
processed; batches accumulate under one manifest; consumers read the
union; changed (non-immutable) inputs are rejected."""

import json
import os

import pytest

from trafaret_ray.pipelines.flagship import (incremental_features,
                                             run_flagship,
                                             run_incremental)
from trafaret_ray.sources.transcripts import generate_table


def _write(d, name, n, seed):
    import pyarrow.parquet as pq
    path = os.path.join(d, name)
    pq.write_table(generate_table(n_turns=n, seed=seed), path)
    return path


class TestIncremental:
    def test_batches_accumulate(self, ray_session, tmp_path):
        ind = tmp_path / 'in'
        outd = tmp_path / 'out'
        ind.mkdir()
        _write(str(ind), 'a.parquet', 400, 1)
        _write(str(ind), 'b.parquet', 300, 2)
        r1 = run_incremental(str(ind), str(outd), num_buckets=4)
        assert r1['n_new'] == 2 and r1['n_skipped'] == 0
        # nothing new -> no-op
        r2 = run_incremental(str(ind), str(outd), num_buckets=4)
        assert r2['n_new'] == 0 and r2['n_skipped'] == 2 \
            and r2['batch'] is None
        # a third file -> exactly one processed
        _write(str(ind), 'c.parquet', 200, 3)
        r3 = run_incremental(str(ind), str(outd), num_buckets=4)
        assert r3['n_new'] == 1 and r3['n_skipped'] == 2
        man = json.load(open(outd / 'ingest_manifest.json'))
        assert len(man['batches']) == 2
        assert man['files']['c.parquet']['batch'] == r3['batch']
        # consumer view == one-shot run over all three inputs
        feats = incremental_features(str(outd))
        oneshot = run_flagship(
            [str(ind / n) for n in ('a.parquet', 'b.parquet',
                                    'c.parquet')],
            str(tmp_path / 'oneshot'), num_buckets=4)
        assert feats.count() == oneshot['rows_ok']
        # per-file lineage survives inside each batch
        b1 = json.load(open(
            outd / 'batches' / r1['batch'] / 'metrics.json'))
        assert set(b1['per_file']) == {'a.parquet', 'b.parquet'}

    def test_mutated_input_rejected(self, ray_session, tmp_path):
        ind = tmp_path / 'in'
        outd = tmp_path / 'out'
        ind.mkdir()
        _write(str(ind), 'a.parquet', 300, 4)
        run_incremental(str(ind), str(outd), num_buckets=4)
        _write(str(ind), 'a.parquet', 500, 5)   # mutate in place
        with pytest.raises(ValueError, match='immutable'):
            run_incremental(str(ind), str(outd), num_buckets=4)
