"""End-to-end curation pipeline: language + quality gates, exact and
near dedup, canonical selection, determinism."""

import numpy as np
import pyarrow as pa


def _corpus():
    rng = np.random.default_rng(9)
    en = ['the cat and the dog went to the market today again',
          'it is a good day for the old man and the sea']
    docs = []
    ids = []
    for i in range(40):  # filler English docs
        ids.append(i)
        base = en[i % 2].split()
        rng.shuffle(base)
        docs.append('the is and ' + ' '.join(base))
    ids.append(100); docs.append('the cat AND   the dog went to the '
                                 'market today again the is and it for')
    ids.append(101); docs.append('the cat and the dog went to the '
                                 'market today again the is and it for')
    # 101 is an exact dup of 100 after normalization
    ids.append(102); docs.append('zz qq ww rr tt yy uu ii oo pp')  # unknown lang
    ids.append(103); docs.append('the cat')                         # too short
    return pa.table({'doc_id': pa.array(ids, type=pa.int64()),
                     'text': pa.array(docs)})


class TestCuration:
    def test_gates_dedup_and_determinism(self, ray_session):
        import ray.data as rd
        from trafaret_ray.pipelines.curation import curate_documents
        out = curate_documents(rd.from_arrow(_corpus()), langs=('en',),
                               min_words=5, near_threshold=0.8,
                               num_buckets=8).to_pandas()
        kept = set(out['doc_id'])
        assert 102 not in kept          # unknown language dropped
        assert 103 not in kept          # too short dropped
        # exact dup pair: only the canonical (min id) survives
        assert 100 in kept and 101 not in kept
        assert (out['n_words'] >= 5).all()
        assert (out['lang'] == 'en').all()
        # deterministic rerun
        out2 = curate_documents(rd.from_arrow(_corpus()), langs=('en',),
                                min_words=5, near_threshold=0.8,
                                num_buckets=8).to_pandas()
        a = out.sort_values('doc_id').reset_index(drop=True)
        b = out2.sort_values('doc_id').reset_index(drop=True)
        assert a.values.tolist() == b.values.tolist()
