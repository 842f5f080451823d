"""Similarity-operator parity: the LSH-bucketed scale paths must equal
their exact baselines (SURVEY §5.4 two-implementation checking), and
the ANN path must hit its recall contract vs brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fscrawler_spark.operators.similarity import (
    _auto_lsh_params,
    brute_force_topk,
    embedding_dedup_pairs,
    hyperplane_lsh_topk,
)

SF = "/root/testdata/sf0.01"


def _pairs(df):
    return {(r["id_a"], r["id_b"], r["cos6"]) for r in df.collect()}


def test_auto_lsh_params_regimes():
    # realistic near-dup threshold: selective buckets, bounded tables
    p_hi, t_hi = _auto_lsh_params(0.95)
    assert p_hi >= 12 and t_hi <= 128
    # low threshold: LSH must go dense to keep the exactness guarantee
    p_lo, t_lo = _auto_lsh_params(0.45)
    assert p_lo < p_hi and t_lo <= 128


def test_embedding_dedup_lsh_equals_exact_low_threshold(spark):
    """q26's regime: bucketed path == all-pairs on the sf0.01 embeddings
    at the (LSH-hostile) 0.45 threshold."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = _pairs(embedding_dedup_pairs(e, threshold=0.45, method="exact"))
    lsh = _pairs(embedding_dedup_pairs(e, threshold=0.45, method="lsh"))
    assert lsh == exact
    assert exact, "fixture must contain live pairs at 0.45"


def test_embedding_dedup_lsh_equals_exact_realistic_threshold(spark):
    """Planted near-duplicates at the realistic 0.9 threshold (the
    selective-bucket regime the operator is designed for at scale)."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # plant 10 near-dups: id 100+i is a tiny perturbation of id i
    for i in range(10):
        w = base[i] + 0.05 * rng.standard_normal(64)
        rows.append((100 + i, [float(x) for x in w]))
    e = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    exact = _pairs(embedding_dedup_pairs(e, threshold=0.9, method="exact"))
    lsh = _pairs(embedding_dedup_pairs(e, threshold=0.9, method="lsh"))
    assert lsh == exact
    # the bench cost knob (miss 1e-6, full table cap -> 14 planes /
    # 114 tables, the measured-fastest regime) must stay exact too
    fast = _pairs(
        embedding_dedup_pairs(
            e, threshold=0.9, method="lsh", target_miss=1e-6, max_tables=128
        )
    )
    assert fast == exact
    planted = {(i, 100 + i) for i in range(10)}
    assert planted <= {(a, b) for a, b, _ in exact}


def test_ann_lsh_recall_vs_brute(spark):
    """hyperplane_lsh_topk (after the ids-only candidate dedup) must
    retrieve genuinely-near neighbors — planted corpus, since the
    synthetic sf embeddings are near-orthogonal (no true neighbors for
    12-bit buckets to find; q19's 5-row output at sf0.01 is that, not a
    bug) — and its output must stay deterministic (seeded planes)."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal((30, 64))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # plant 2 close neighbors per future query vector (ids 0..7)
    nid = 1000
    for i in range(8):
        for _ in range(2):
            w = base[i] + 0.15 * rng.standard_normal(64)
            rows.append((nid, [float(x) for x in w]))
            nid += 1
    e = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = e.where(F.col("vec_id") < 8)
    brute_top2 = {
        (r["qid"], r["cid"])
        for r in brute_force_topk(q, e, k=2).collect()
    }
    ann1 = {
        (r["qid"], r["cid"]) for r in hyperplane_lsh_topk(q, e, k=2).collect()
    }
    ann2 = {
        (r["qid"], r["cid"]) for r in hyperplane_lsh_topk(q, e, k=2).collect()
    }
    assert ann1 == ann2, "seeded ANN must be deterministic"
    recall = len(ann1 & brute_top2) / len(brute_top2)
    assert recall >= 0.8, f"recall on planted neighbors collapsed: {recall}"


def test_ivf_topk_recall_and_determinism(spark):
    """IVF (coarse-quantize -> probe -> exact rerank): on clustered
    data with planted neighbors it must recover the brute-force top-2
    with high recall and be run-to-run deterministic."""
    from fscrawler_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(11)
    # 4 well-separated clusters + planted near-neighbors for queries
    centers = rng.standard_normal((4, 64)) * 6
    rows = []
    vid = 0
    for ci in range(4):
        for _ in range(25):
            rows.append((vid, [float(x) for x in centers[ci] + rng.standard_normal(64)]))
            vid += 1
    e = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = e.where(F.col("vec_id") % 25 == 0)  # one query per cluster
    brute = {
        (r["qid"], r["cid"]) for r in brute_force_topk(q, e, k=2).collect()
    }
    from fscrawler_spark.operators.similarity import ivf_topk as _ivf

    a1 = {(r["qid"], r["cid"])
          for r in _ivf(q, e, k=2, n_centroids=8, n_probe=3).collect()}
    a2 = {(r["qid"], r["cid"])
          for r in _ivf(q, e, k=2, n_centroids=8, n_probe=3).collect()}
    assert a1 == a2, "IVF must be deterministic"
    recall = len(a1 & brute) / len(brute)
    assert recall >= 0.75, f"IVF recall collapsed: {recall}"


def test_ivf_corpus_partitioning_is_single_cell(spark):
    """Every corpus vector lands in exactly one cell (so candidate
    pairs need no dedup and the per-query read fraction is
    n_probe/n_centroids)."""
    from fscrawler_spark.operators.similarity import (
        _nearest_centroid_udf,
        train_ivf_centroids,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = train_ivf_centroids(e, n_centroids=8, iters=3)
    assert cents.shape == (8, 64)
    assign = _nearest_centroid_udf(cents, 1)
    cells = e.select(F.element_at(assign(F.col("embedding")), 1).alias("cell"))
    n = cells.count()
    assert cells.where(F.col("cell").between(0, 7)).count() == n


def test_ivf_materialized_index_parity_and_pruning(spark, tmp_path):
    """write_ivf_index + ivf_topk_from_index: identical results to the
    in-memory ivf_topk (same quantizer params), and the probe's scan
    carries a PartitionFilters IN-predicate on the cell directories —
    the executed form of the "reads n_probe/n_centroids" claim."""
    from fscrawler_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_from_index,
        read_ivf_centroids,
        train_ivf_centroids,
        write_ivf_index,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 6)
    path = str(tmp_path / "ivf")
    cents = write_ivf_index(e, path, n_centroids=8, iters=3)
    # the sidecar round-trips the quantizer exactly
    assert np.array_equal(cents, read_ivf_centroids(path))
    assert np.array_equal(cents, train_ivf_centroids(e, n_centroids=8, iters=3))

    mem = {
        (r["qid"], r["cid"], r["rank"])
        for r in ivf_topk(q, e, k=3, n_centroids=8, n_probe=2, iters=3).collect()
    }
    idx_df = ivf_topk_from_index(spark, q, path, k=3, n_probe=2)
    idx = {(r["qid"], r["cid"], r["rank"]) for r in idx_df.collect()}
    assert idx == mem and idx

    import io
    import re
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        idx_df.explain("formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and re.search(r"cell#\d+ IN \(", pf[0]), pf


def test_ivf_centroids_order_independent(spark):
    """r02 advisory: centroid means must not depend on partitioning —
    decimal-grid sums make them bit-identical across repartitionings."""
    from fscrawler_spark.operators.similarity import train_ivf_centroids

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = train_ivf_centroids(e.repartition(3), n_centroids=8, iters=3)
    b = train_ivf_centroids(e.repartition(17), n_centroids=8, iters=3)
    assert np.array_equal(a, b)


def test_repeated_ngram_passages_exact(spark):
    """Hand-built corpus: a 9-word passage shared by docs 1/2/3 (two
    8-gram windows, three docs each), an 8-gram shared by 4/5 only,
    and unique text in 6; singleton grams are dropped."""
    from fscrawler_spark.operators.similarity import (
        repeated_ngram_passages,
    )

    passage = "the quick brown fox jumps over the lazy dog"
    octet = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"{passage} first tail words"),
        (2, f"intro {passage}"),
        (3, passage),
        (4, f"{octet} trailing"),
        (5, f"lead-in {octet}"),
        (6, "completely unrelated text with eight distinct words here"),
        (7, "short"),
        (8, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["gram"], r["n_docs"])
        for r in repeated_ngram_passages(df, "doc_id", "text", 8, 2).collect()
    }
    w = passage.split()
    assert got == {
        (" ".join(w[0:8]), 3),
        (" ".join(w[1:9]), 3),
        (octet, 2),
    }


def _py_winnow(text, k=4, w=4):
    """Pure-Python reference winnowing (Schleimer et al. 2003): md5-hex
    prefix gram hashes, leftmost-min per window (min() on equal keys is
    positional-stable but equal hex strings are equal values, so the
    selected SET is tie-agnostic)."""
    import hashlib
    import re

    toks = re.split(r"\s+", text.strip().lower()) if text and text.strip() else []
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [hashlib.md5(g.encode()).hexdigest()[:8] for g in grams]
    if not hs:
        return set()
    n_win = max(1, len(hs) - w + 1)
    return {min(hs[j : j + w]) for j in range(n_win)}


def test_winnow_matches_python_reference(spark):
    from fscrawler_spark.operators.similarity import winnow_fingerprints

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "a b c d e f g h i j k l m n o p q r s t"),
        (3, "one two three four"),          # exactly k tokens -> 1 gram
        (4, "one two three"),               # < k tokens -> nothing
        (5, "x y z w x y z w x y z w"),     # heavy repetition / hash ties
        (6, None),
        (7, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=4, w=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    want = {i: _py_winnow(t) for i, t in rows if _py_winnow(t)}
    assert got == want


def test_winnow_coverage_guarantee(spark):
    """The winnowing guarantee: two documents sharing a substring of
    >= k + w - 1 words share at least one fingerprint."""
    from fscrawler_spark.operators.similarity import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 = k + w - 1
    rows = [
        (1, f"completely different head words here {shared}"),
        (2, f"{shared} and an unrelated long tail of filler tokens"),
        (3, "no overlap with anything else in this tiny corpus at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=4, w=4).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2], "shared 7-word substring must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnow_plan_is_jvm_only_single_exchange(spark):
    """Hot path stays in codegen: no Python eval; the only exchanges
    are the doc-id hash partition for the window + the distinct."""
    from fscrawler_spark.operators.similarity import winnow_fingerprints

    df = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id long, text string")
    plan = winnow_fingerprints(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_prefix_filter_equals_exact_all_pairs(spark):
    """PPJoin-style prefix filtering is EXACT: identical pair set and
    jaccard values to the O(n^2) baseline on a mixed corpus (near-dups,
    partial overlaps, unrelated docs, tiny docs)."""
    import random

    from fscrawler_spark.operators.similarity import (
        exact_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(24):
        base = rng.sample(vocab, 12)
        rows.append((2 * i, " ".join(base)))
        # a near-dup with a few words swapped
        mut = list(base)
        for _ in range(rng.randrange(0, 4)):
            mut[rng.randrange(len(mut))] = rng.choice(vocab)
        rows.append((2 * i + 1, " ".join(mut)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filter_jaccard_pairs(df, "doc_id", "text", 0.5, 3).collect()
    }
    want = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in exact_jaccard_pairs(df, "doc_id", "text", 0.5, 3).collect()
    }
    assert got == want and len(want) > 0


def test_scalar_quantize_reference_and_roundtrip(spark):
    """numpy reference parity + reconstruction error bound
    (<= scale/510 per element, the SQ8 guarantee)."""
    import numpy as np

    from fscrawler_spark.operators.similarity import scalar_quantize_codes

    rng = np.random.default_rng(5)
    vecs = [rng.standard_normal(16).astype(np.float32) for _ in range(6)]
    vecs.append(np.zeros(8, dtype=np.float32))  # constant vector -> code 0
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {}
    for r in scalar_quantize_codes(df, "vec_id", "embedding").collect():
        got.setdefault(r["vec_id"], {})[r["pos"]] = r["code"]
    for i, v in enumerate(vecs):
        xd = v.astype(np.float64)
        mn, mx = xd.min(), xd.max()
        if mx == mn:
            want = np.zeros(len(xd), dtype=int)
        else:
            want = np.floor(255.0 * (xd - mn) / (mx - mn) + 0.5).astype(int)
        assert [got[i][p] for p in range(len(xd))] == list(want), i
        if mx > mn:
            recon = mn + np.array(want) * (mx - mn) / 255.0
            assert np.abs(recon - xd).max() <= (mx - mn) / 510 + 1e-12


def test_winnow_density_property(spark):
    """Schleimer et al.'s expected density 2/(w+1): on random text the
    selected-fingerprint count per document sits in a generous band
    around 2/(w+1) of the window count (selected POSITIONS, which the
    distinct-fp output lower-bounds; random 8-hex hashes make repeats
    negligible at this size)."""
    import random

    from fscrawler_spark.operators.similarity import winnow_fingerprints

    rng = random.Random(21)
    vocab = [f"tok{i}" for i in range(5000)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(400))) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=4, w=4).collect():
        counts[r["doc_id"]] = counts.get(r["doc_id"], 0) + 1
    n_windows = 400 - 4 + 1 - 3  # grams - w + 1
    expect = 2 / (4 + 1) * n_windows
    for i, c in counts.items():
        assert 0.6 * expect < c < 1.6 * expect, (i, c, expect)


def test_semdedup_matches_pure_python(spark):
    """Pure-python SemDeDup reference: same SQ8 assignment (via the
    clustering reference arithmetic), same intra-cluster round-6
    cosine pruning, min-id keep."""
    import hashlib
    import math

    from fscrawler_spark.operators.similarity import semdedup_cluster_stats

    # Deterministic vectors with planted near-dup pairs (i, i+100).
    def vec(i):
        h = hashlib.md5(f"sd{i % 100}".encode()).digest()
        base = [b / 255.0 for b in h[:8]]
        if i >= 100:  # near-dup of its partner: tiny perturbation
            base = [x + 0.001 * ((i % 7) + 1) for x in base]
        return base

    ids = list(range(140))
    df = spark.createDataFrame(
        [(i, vec(i)) for i in ids], "vid long, emb array<float>"
    )
    got = {
        r["cluster"]: (r["n_vecs"], r["n_dropped"], r["n_kept"])
        for r in semdedup_cluster_stats(df, "vid", "emb", k=4, threshold=0.999).collect()
    }

    # Reference: quantize (float32-widened like the engine), assign to
    # md5-order seed centroids, prune within cluster.
    import numpy as np

    def codes(v):
        a = np.asarray(np.asarray(v, dtype=np.float32), dtype=np.float64)
        mn, mx = a.min(), a.max()
        if mx == mn:
            return np.zeros(len(a), dtype=np.int64)
        return np.round(255 * (a - mn) / (mx - mn)).astype(np.int64)

    cs = {i: codes(vec(i)) for i in ids}
    seed_ids = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:4]
    cents = {c: cs[i] for c, i in enumerate(seed_ids)}
    asg = {
        i: min((int(((cs[i] - cents[c]) ** 2).sum()), c) for c in cents)[1]
        for i in ids
    }

    def cos6(a, b):
        a32 = np.asarray(np.asarray(a, dtype=np.float32), dtype=np.float64)
        b32 = np.asarray(np.asarray(b, dtype=np.float32), dtype=np.float64)
        return round(
            float(a32 @ b32) / (math.sqrt(float(a32 @ a32)) * math.sqrt(float(b32 @ b32))),
            6,
        )

    dropped = set()
    for x in ids:
        for y in ids:
            if x < y and asg[x] == asg[y] and cos6(vec(x), vec(y)) >= 0.999:
                dropped.add(y)
    want = {}
    for c in set(asg.values()):
        members = [i for i in ids if asg[i] == c]
        nd = sum(1 for i in members if i in dropped)
        want[c] = (len(members), nd, len(members) - nd)
    assert got == want
    assert sum(nd for _, nd, _ in got.values()) > 0  # pruning actually fired


def _shingles_py(text, k=3):
    toks = " ".join((text or "").lower().split()).split(" ")
    if len(toks) < k or toks == [""]:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_containment_pairs_match_brute_force(spark):
    from fscrawler_spark.operators.similarity import containment_pairs

    docs = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta"),               # contained in 0
        (2, "alpha beta gamma delta epsilon zeta"),  # identical to 0
        (3, "totally different words here indeed"),
        (4, "xx alpha beta gamma delta epsilon zeta yy"),  # contains 0
        (5, ""),
        (6, "two words"),
    ]
    thr = 5000
    sets = {i: _shingles_py(t) for i, t in docs}
    want = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b or not sa:
                continue
            inter = len(sa & sb)
            score = inter * 10000 // len(sa)
            if score >= thr:
                want[(a, b)] = (inter, len(sa), score)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["inter_n"], r["size_a"], r["contain_e4"])
        for r in containment_pairs(df, "doc_id", "text", threshold_e4=thr).collect()
    }
    assert got == want
    # the asymmetric case Jaccard misses: 1 ⊂ 0 scores 10000 one way only
    assert got[(1, 0)][2] == 10000
    assert (0, 1) not in got or got[(0, 1)][2] < 10000


def test_containment_max_df_caps_hot_shingles(spark):
    from fscrawler_spark.operators.similarity import containment_pairs

    # one boilerplate shingle shared by ALL docs; with max_df=2 it must
    # not create any pair on its own
    docs = [(i, f"common boiler plate unique{i} tail{i} end{i}") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = containment_pairs(
        df, "doc_id", "text", threshold_e4=1, max_df=2
    ).collect()
    assert got == []
