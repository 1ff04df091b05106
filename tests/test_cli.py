"""The ray-job CLI entry point, end-to-end in a subprocess (it owns its
own Ray session, so it must not share the test fixture's)."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq


def test_cli_run_and_resume(tmp_path):
    from trafaret_ray.sources.transcripts import write_transcripts
    inp = str(tmp_path / 'in')
    out = str(tmp_path / 'out')
    write_transcripts(inp, n_turns=2000, seed=11, malformed_frac=0.05,
                      rows_per_file=1000)
    env = dict(os.environ, PYTHONPATH='/root/repo')
    env.pop('RAY_ADDRESS', None)   # the CLI picks local mode itself
    cmd = [sys.executable, '-m', 'trafaret_ray.run', '--input', inp,
           '--out', out, '--num-buckets', '4', '--num-cpus', '4']
    r1 = subprocess.run(cmd, env=env, capture_output=True, text=True,
                        timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert m1['rows_ok'] > 0 and m1['rows_quarantined'] > 0
    assert m1['per_file'] and m1['error_codes']
    feat_dir = os.path.join(out, 'features')
    n_feat = sum(pq.read_metadata(os.path.join(feat_dir, f)).num_rows
                 for f in os.listdir(feat_dir) if f.endswith('.parquet'))
    assert n_feat == m1['rows_ok']

    # resume: identical metrics, stages untouched
    v_mtime = os.path.getmtime(os.path.join(out, 'validated'))
    r2 = subprocess.run(cmd, env=env, capture_output=True, text=True,
                        timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert m2 == m1
    assert os.path.getmtime(os.path.join(out, 'validated')) == v_mtime


def test_cli_curate(tmp_path):
    out = str(tmp_path / 'curated')
    env = dict(os.environ, PYTHONPATH='/root/repo')
    env.pop('RAY_ADDRESS', None)
    cmd = [sys.executable, '-m', 'trafaret_ray.run', '--pipeline',
           'curate', '--input',
           '/root/testdata/sf0.001/documents.parquet', '--out', out,
           '--num-buckets', '4', '--num-cpus', '4',
           '--near-threshold', '0.5']
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m['pipeline'] == 'curate'
    assert 0 < m['docs_kept'] < m['docs_in']
    n = sum(pq.read_metadata(os.path.join(out, f)).num_rows
            for f in os.listdir(out) if f.endswith('.parquet'))
    assert n == m['docs_kept']
    # deterministic end-to-end: the query-suite curation at the same
    # settings keeps the same count (445 at sf0.001, CORRECTNESS r3)
    assert m['docs_kept'] == 445


def test_cli_conv_dedup(tmp_path):
    import pyarrow as pa
    from trafaret_ray.sources.transcripts import write_transcripts
    inp = str(tmp_path / 'in')
    out = str(tmp_path / 'out')
    write_transcripts(inp, n_turns=1500, seed=3, malformed_frac=0.0,
                      rows_per_file=1000)
    # plant one verbatim duplicate conversation as an extra shard
    t0 = pq.read_table(os.path.join(inp, 'part-00000.parquet'))
    first = t0.column('conv_id')[0].as_py()
    import pyarrow.compute as pc
    sub = t0.filter(pc.equal(t0.column('conv_id'), first))
    dup_id = pa.array(['dup-' + first] * sub.num_rows, pa.string())
    sub = sub.set_column(sub.schema.get_field_index('conv_id'),
                         'conv_id', dup_id)
    pq.write_table(sub, os.path.join(inp, 'part-dup.parquet'))

    env = dict(os.environ, PYTHONPATH='/root/repo')
    env.pop('RAY_ADDRESS', None)
    cmd = [sys.executable, '-m', 'trafaret_ray.run', '--input', inp,
           '--out', out, '--pipeline', 'conv-dedup',
           '--num-buckets', '4', '--num-cpus', '4',
           '--near-threshold', '0.5']
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m['pipeline'] == 'conv-dedup'
    assert m['conversations'] > 0
    ex = pq.read_table(os.path.join(out, 'exact')).to_pandas()
    g = dict(zip(ex['conv_id'], ex['group']))
    assert g['dup-' + first] == first
    nr = pq.read_table(os.path.join(out, 'near')).to_pandas()
    assert ('dup-' + first) in set(nr['conv_id'])
