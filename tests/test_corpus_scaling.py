"""Corpus-size scaling evidence for the text-dedup layer (VERDICT r02
#4): the r02 numbers were all measured at 5k docs; this pins HOW the
layer behaves when the corpus grows 10x.

* jaccard candidate count must grow ~linearly with corpus size at a
  fixed threshold — the PPJoin prefix filter's job is to keep the
  quadratic all-pairs background out; a super-linear blowup here is
  the 100 TB failure mode.
* verified near-dup pairs grow exactly linearly by construction of
  synth_docs (1 in 10 docs is a mutated copy of its predecessor).
* alternating-star connected-components rounds grow O(log n), not
  O(n): 10x more components must cost at most a couple extra rounds.
"""

import pytest

from pygeoops_spark.corpus.pages import synth_docs
from pygeoops_spark.text.dedup import _jaccard_candidates, shingle_hash_arrays
from pygeoops_spark.text.pipeline import connected_components

SMALL = 1_500
LARGE = 15_000


@pytest.fixture(scope="module")
def measurements(spark):
    out = {}
    for n in (SMALL, LARGE):
        docs = synth_docs(spark, n)
        arr = shingle_hash_arrays(docs, "doc_id", "text", 3)
        cands = _jaccard_candidates(arr, "doc_id", 0.5)
        n_cands = cands.count()
        # verified pairs == the constructed near-dup pairs
        from pygeoops_spark.text.dedup import jaccard_pairs

        pairs = jaccard_pairs(docs, threshold=0.5)
        n_pairs = pairs.count()
        stats = {}
        connected_components(pairs, stats=stats).count()
        out[n] = {
            "cands": n_cands,
            "pairs": n_pairs,
            "cc_rounds": stats["rounds"],
        }
    return out


def test_candidates_grow_linearly(measurements):
    s, l = measurements[SMALL], measurements[LARGE]
    ratio = l["cands"] / max(s["cands"], 1)
    # 10x docs -> at most ~1.5x-per-doc candidate growth; a quadratic
    # blowup would show ratio ~100
    assert ratio <= 15.0, f"candidate growth {ratio:.1f}x for 10x docs"
    assert l["cands"] >= LARGE / 10  # at least the true pairs are there


def test_true_pairs_exactly_linear(measurements):
    assert measurements[SMALL]["pairs"] == SMALL // 10
    assert measurements[LARGE]["pairs"] == LARGE // 10


def test_cc_rounds_logarithmic(measurements):
    s, l = measurements[SMALL], measurements[LARGE]
    assert l["cc_rounds"] <= s["cc_rounds"] + 2, (
        f"CC rounds grew {s['cc_rounds']} -> {l['cc_rounds']} for 10x docs"
    )
