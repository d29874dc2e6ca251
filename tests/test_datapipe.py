"""Datapipe operators: recomputation goldens + sketch recall + stub plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rasters_spark import codec, fixtures
from rasters_spark.datapipe import dedup, multimodal, similarity, textstats
from rasters_spark.tiles import load_tiles

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_minhash_lsh_recall_complete(spark, docs):
    """On the deterministic fixtures, LSH candidates must cover every
    brute-force pair at the threshold (this is what licenses using the
    brute force as the driver oracle)."""
    exact = {(r.doc_a, r.doc_b) for r in dedup.ngram_jaccard_pairs(docs, 3, 0.85).collect()}
    lsh = {(r.doc_a, r.doc_b) for r in dedup.minhash_lsh_pairs(docs, threshold=0.85).collect()}
    assert exact and lsh == exact


def test_simhash_matches_python_recomputation(spark, docs):
    got = {r.doc_id: r.simhash for r in dedup.simhash64(docs).collect()}
    sample = docs.limit(20).collect()
    # recompute ONE doc's hash bit-by-bit using Spark's own xxhash64 for
    # token hashes (the only non-portable primitive), majority vote in python
    for row in sample[:5]:
        toks = [t for t in row.text.split(" ") if t]
        hdf = spark.createDataFrame([(t,) for t in toks], "tok string").select(F.xxhash64("tok").alias("h"))
        hs = [r.h for r in hdf.collect()]
        sig = 0
        for bit in range(64):
            vote = sum(1 if (h >> bit) & 1 else -1 for h in hs)
            if vote > 0:
                sig |= 1 << bit
        if sig >= 1 << 63:  # int64 two's complement like Spark's bigint
            sig -= 1 << 64
        assert got[row.doc_id] == sig


def test_ivf_topk_recall_and_determinism(spark, emb):
    """IVF ANN: recall vs exact brute force on the near-orthogonal
    fixtures (the hard case for any coarse quantizer) and bit-exact
    determinism across two full fits (id-prefix init, fixed rounds)."""
    q = emb.filter("vec_id < 20")
    brute = {(r.query_id, r.vec_id) for r in similarity.cosine_topk(emb, q, k=5).collect()}
    got = similarity.ivf_cosine_topk(emb, q, k=5, nlist=16, nprobe=4, iters=3).collect()
    hits = sum(1 for r in got if (r.query_id, r.vec_id) in brute)
    assert hits / len(brute) >= 0.7  # measured 0.82 probing 4/16 lists
    again = similarity.ivf_cosine_topk(emb, q, k=5, nlist=16, nprobe=4, iters=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # the quantizer itself: nlist centroids, every corpus vector assigned
    cents = similarity.ivf_fit(emb, nlist=16, iters=3)
    assert cents.count() == 16
    assert similarity._ivf_assign(emb.select("vec_id", "embedding"), cents).count() == emb.count()


def test_ivf_assign_kernel_path_matches_literal_fold(spark, emb):
    """Above IVF_LITERAL_MAX the assignment switches to the broadcast
    numpy argmax kernel (VERDICT r03 #1). Forcing the kernel path onto
    the same small centroid set must reproduce the literal fold's
    assignment exactly (same strict-> / first-max tie rule)."""
    cents = similarity.ivf_fit(emb, nlist=16, iters=2)
    lit = {r.vec_id: r.cluster
           for r in similarity._ivf_assign(emb.select("vec_id", "embedding"), cents).collect()}
    old = similarity.IVF_LITERAL_MAX
    try:
        similarity.IVF_LITERAL_MAX = 0  # force the mapInPandas path
        ker_df = similarity._ivf_assign(emb.select("vec_id", "embedding"), cents)
        assert "MapInPandas" in ker_df._jdf.queryExecution().executedPlan().toString()
        ker = {r.vec_id: r.cluster for r in ker_df.collect()}
    finally:
        similarity.IVF_LITERAL_MAX = old
    assert ker == lit


def test_ivf_nlist_1024_no_plan_blowup(spark):
    """VERDICT r03 #1 'done' criterion: nlist=1024 end-to-end without
    plan explosion. 2048 deterministic 8-dim vectors → fit 1 Lloyd
    round at nlist=1024, assign the corpus, run a query — the physical
    plan stays kernel-shaped (MapInPandas), no 1024×8 literal fold."""
    n, dims = 2048, 8
    rows = [(i, [float(((i * 2654435761 + d * 97) % 1000) - 500) / 500.0
                 for d in range(dims)]) for i in range(n)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = similarity.ivf_fit(e, nlist=1024, iters=1, dims=dims)
    assert cents.count() == 1024
    adf = similarity._ivf_assign(e, cents)
    plan = adf._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert len(plan) < 200_000  # a 1024×8 literal fold would be MBs of plan text
    assert adf.count() == n
    assert adf.select("cluster").distinct().count() > 64
    q = e.filter("vec_id < 5")
    got = similarity.ivf_cosine_topk(e, q, k=3, nlist=1024, nprobe=32, iters=1, dims=dims)
    assert got.count() == 15


def test_ivf_params_probed_fraction_shrinks():
    """nlist ~ √N, nprobe ~ √nlist ⇒ probed fraction ≈ N^(-1/4)."""
    assert similarity.ivf_params(256) == (16, 4)
    nlist6, nprobe6 = similarity.ivf_params(10**6)
    assert nlist6 == 1000 and nprobe6 == 32
    fr = [similarity.ivf_params(n)[1] / similarity.ivf_params(n)[0]
          for n in (10**3, 10**6, 10**9, 10**12)]
    assert all(a > b for a, b in zip(fr, fr[1:]))
    assert fr[-1] <= 1e-3  # N^(-1/4) = 0.1% of a 10^12 corpus probed per query


def test_ivf_bucketed_index_matches_inline_and_prunes_buckets(spark, emb):
    """The persisted IVF index (posting lists bucketed on cluster)
    returns the IDENTICAL top-k as the in-flight path at the same
    quantizer parameters, and the probe scan is bucket-pruned — the
    parquet scan reads only the probed lists (SelectedBucketsCount)."""
    import re

    q = emb.filter("vec_id < 10")
    similarity.ivf_write_index(spark, emb, table_name="t_ivf_idx", nlist=16, iters=3)
    got_df = similarity.ivf_topk_bucketed(spark, q, table_name="t_ivf_idx", k=5, nprobe=4)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, "bucketed scan not pruned:\n" + plan[:2000]
    assert int(m.group(1)) < int(m.group(2))
    got = sorted(map(tuple, got_df.collect()))
    exp = sorted(map(tuple, similarity.ivf_cosine_topk(
        emb, q, k=5, nlist=16, nprobe=4, iters=3).collect()))
    assert got == exp and len(got) == 50


def test_embedding_near_dups_no_job_during_planning(spark, emb):
    """VERDICT r03 #2: with a corpus_size hint, building the near-dup
    plan must not trigger any Spark job (the old default ran a full
    count() before planning)."""
    sc = spark.sparkContext
    sc.setJobGroup("plan-only", "near-dup planning")
    try:
        df = similarity.embedding_near_dup_pairs(emb, threshold=0.999, corpus_size=500)
        df.schema  # force analysis
        assert sc.statusTracker().getJobIdsForGroup("plan-only") == []
    finally:
        sc.setJobGroup(None, None)
    assert df.columns == ["id_a", "id_b", "cos"]


def test_simhash_md5_matches_python_recomputation(spark, docs):
    """The md5-bit SimHash variant is fully portable: recompute whole
    signatures in pure python hashlib (no Spark primitive needed, unlike
    xxhash64 above) — this is exactly what makes it oracle-checkable."""
    import hashlib

    got = {r.doc_id: r.simhash for r in dedup.simhash_md5(docs).collect()}
    for row in docs.limit(5).collect():
        toks = [t for t in row.text.split(" ") if t]
        hs = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks]
        sig = 0
        for bit in range(60):
            if sum(1 if (h >> bit) & 1 else -1 for h in hs) > 0:
                sig |= 1 << bit
        assert got[row.doc_id] == sig

    # near-identical docs agree on most bits; unrelated docs don't
    near = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog " * 8),
         (1, "the quick brown fox jumps over the lazy cat " + "the quick brown fox jumps over the lazy dog " * 7),
         (2, "completely different words entirely unrelated corpus tokens here now " * 8)],
        "doc_id long, text string")
    sigs = {r.doc_id: r.simhash for r in dedup.simhash_md5(near).collect()}
    assert bin(sigs[0] ^ sigs[1]).count("1") < bin(sigs[0] ^ sigs[2]).count("1")


def test_lsh_cosine_recall(spark, emb):
    q = emb.filter("vec_id < 20")
    exact = {(r.query_id, r.vec_id) for r in similarity.cosine_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.vec_id) for r in similarity.lsh_cosine_topk(emb, q, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    # fixture embeddings are near-orthogonal — the adversarial case for
    # angular LSH; assert the multi-probe floor, not a clustered-data target
    assert recall >= 0.3, recall


def test_cosine_topk_matches_numpy(spark, emb):
    got = similarity.cosine_topk(emb, emb.filter("vec_id < 5"), k=3).toPandas()
    p = emb.toPandas()
    M = np.array([np.array(v, dtype=np.float64) for v in p.embedding])
    ids = p.vec_id.to_numpy()
    for qid in range(5):
        qv = M[ids == qid][0]
        cos = (M @ qv) / (np.linalg.norm(M, axis=1) * np.linalg.norm(qv))
        cos[ids == qid] = -np.inf
        order = np.lexsort((ids, -cos))
        top = [(int(ids[i]), cos[i]) for i in order[:3]]
        sub = got[got.query_id == qid].sort_values("rank")
        assert list(sub.vec_id) == [t[0] for t in top]
        np.testing.assert_allclose(sub.cos.to_numpy(), [t[1] for t in top], rtol=1e-9)


def test_fingerprint_python_recomputation(spark, docs):
    got = {r.doc_id: r.fp for r in textstats.fingerprint(docs.limit(10)).collect()}
    for row in docs.limit(10).collect():
        fp = 0
        for ch in row.text:
            fp = (fp * 31 + ord(ch)) % textstats.MOD_P
        assert got[row.doc_id] == fp


def test_media_features_stub_and_quarantine(spark):
    fixtures.ensure_fixtures(SF)
    t = load_tiles(spark, SF).limit(6)
    # inject an undecodable container format row
    bad = t.limit(1).withColumn("fmt", F.lit("jpeg")).withColumn("image_id", F.lit("bad"))
    feats = multimodal.extract_features(t.unionByName(bad)).collect()
    by_id = {r.image_id: r for r in feats}
    assert by_id["bad"].phash is None and by_id["bad"].n_bytes > 0  # quarantined, not dropped
    ok = [r for r in feats if r.image_id != "bad"]
    assert all(r.phash is not None and r.width > 0 for r in ok)
    with pytest.raises(Exception, match="NotImplementedError|jpeg"):
        multimodal.extract_features(bad, on_error="raise").collect()


def test_resize_and_frame_sample(spark):
    fixtures.ensure_fixtures(SF)
    t = load_tiles(spark, SF).limit(3)
    rs = multimodal.resize_nearest(t, 8, 8).collect()
    assert all(r.w == 8 and r.h == 8 and len(r.bytes) == 8 * 8 * 4 for r in rs)
    # fake video: 5 stacked frames of 4x4 float32
    stack = np.arange(5 * 4 * 4, dtype="<f4").tobytes()
    vid = spark.createDataFrame([("v0", stack, 4, 4, "rawstack")],
                                "image_id string, bytes binary, w int, h int, fmt string")
    frames = multimodal.frame_sample(vid, every_n=2).collect()
    assert [f.frame_no for f in sorted(frames, key=lambda x: x.frame_no)] == [0, 2, 4]
    f0 = codec.decode_tile(sorted(frames, key=lambda x: x.frame_no)[0].frame_bytes, 4, 4, "raw")
    np.testing.assert_array_equal(f0, np.arange(16, dtype=np.float32).reshape(4, 4))


def test_exact_dedup_finds_planted_dup(spark, docs):
    dup = docs.limit(1).withColumn("doc_id", F.lit(999_999))
    d2 = docs.unionByName(dup)
    res = dedup.exact_dedup(d2).filter("n_dups > 1").collect()
    assert len(res) == 1 and res[0].n_dups == 2


def test_hamming_band_pairs_pigeonhole_recall(spark):
    # random 64-bit hashes + planted pairs at every Hamming distance
    # 0..3: the 4x16 banded join must find ALL of them (threshold <
    # bands pigeonhole) and nothing below the brute-force answer
    rng = np.random.default_rng(11)
    base = rng.integers(-(1 << 63), 1 << 63, size=300, dtype=np.int64)
    rows = [(f"h{i:04d}", int(v)) for i, v in enumerate(base)]
    for d in range(4):  # plant a distance-d partner for hashes 0..3
        bits = rng.choice(64, size=d, replace=False)
        m = 0
        for b in bits:
            m ^= 1 << int(b)
        rows.append((f"h{d:04d}~p", int(np.int64(np.uint64(base[d]) ^ np.uint64(m)))))
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {(r.id_a, r.id_b, r.hamming)
           for r in dedup.hamming_band_pairs(df, threshold=3, bands=4).collect()}
    brute = set()
    for i, (ia, ha) in enumerate(rows):
        for ib, hb in rows[i + 1:]:
            d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                a, b = sorted((ia, ib))
                brute.add((a, b, d))
    assert got == brute and len(brute) >= 4


def test_hamming_band_pairs_requires_pigeonhole(spark):
    df = spark.createDataFrame([("a", 1)], "image_id string, phash long")
    with pytest.raises(ValueError):
        dedup.hamming_band_pairs(df, threshold=4, bands=4)


def test_dup_groups_lsh_default_equals_exact(spark, docs):
    lsh = {(r.doc_id, r.group_id) for r in dedup.dup_groups(docs).collect()}
    exact = {(r.doc_id, r.group_id)
             for r in dedup.dup_groups(docs, method="exact").collect()}
    assert lsh and lsh == exact


def test_png_decode_path_in_multimodal(spark):
    # engine-written PNGs are a REAL decodable format in the media
    # pipeline (round-trip through functions/render.py's codec)
    from rasters_spark.functions.render import encode_png
    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
    png = encode_png(img)
    df = spark.createDataFrame(
        [("p1", png, 8, 8, "png")], "image_id string, bytes binary, w int, h int, fmt string")
    feats = multimodal.extract_features(df).collect()[0]
    assert feats.width == 8 and feats.height == 8
    assert feats.mean == pytest.approx(float(img.mean()))
    # jpeg stays a declared seam → quarantined NULLs, not a crash
    df2 = spark.createDataFrame(
        [("j1", b"\xff\xd8junk", 8, 8, "jpeg")], "image_id string, bytes binary, w int, h int, fmt string")
    q = multimodal.extract_features(df2).collect()[0]
    assert q.width is None and q.phash is None


def test_embedding_near_dup_pairs_recall(spark, emb):
    # planted exact duplicates must ALL surface (identical vectors share
    # every sign-LSH bucket) and nothing below threshold sneaks in
    e = emb.select("vec_id", "embedding")
    copies = e.filter("vec_id < 20").select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    pool = e.unionByName(copies)
    got = {(r.id_a, r.id_b): r.cos
           for r in similarity.embedding_near_dup_pairs(pool, threshold=0.999).collect()}
    assert set(got) == {(i, i + 1000000) for i in range(20)}
    for c in got.values():
        assert c == pytest.approx(1.0, abs=1e-12)


def test_banded_recall_geq_single_signature(spark, emb):
    """VERDICT r02 #3 'done' criterion: banding (OR across bands) must
    recall at least every pair the old single-signature (AND over all
    planes) design recalls, and near-miss recall must be strictly
    better on the fixture near-duplicates."""
    e = emb.select("vec_id", "embedding").filter("vec_id < 200")
    # near-identical copies: nudge the first coordinate so cos < 1
    near = e.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (x.cast("double") + F.when(i == 0, F.lit(0.1)).otherwise(F.lit(0.0))).cast("float"),
        ).alias("embedding"))
    pool = e.unionByName(near)
    planted = {(i, i + 1000000) for i in range(200)}

    def recalled(bands, r):
        got = similarity.embedding_near_dup_pairs(
            pool, threshold=-1.0, bands=bands, planes_per_band=r)
        return {(a, b) for a, b in got.select("id_a", "id_b").collect()} & planted

    banded = recalled(4, 12)   # OR of 4 × 12-plane tables
    single = recalled(1, 48)   # the round-2 shape: one 48-plane table
    assert banded >= single
    assert len(banded) > len(single)
    assert len(banded) >= 0.9 * len(planted)


def test_minhash_band_join_prebucketed_zero_exchange(spark, docs):
    """VERDICT r02 #5: the band table persisted bucketed on
    (band, bucket) self-joins for candidates with ZERO Exchange."""
    from rasters_spark import tableio
    banded = dedup.minhash_band_table(docs)
    tableio.write_bucketed(spark, banded, "b_bands",
                           bucket_col=["band", "bucket"], n_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("b_bands")
        b = (spark.table("b_bands")
             .withColumnRenamed("doc_id", "doc_b"))
        j = (a.hint("merge").join(b, ["band", "bucket"])
             .filter(F.col("doc_id") < F.col("doc_b")))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        # same candidate set as the in-flight band join
        got = {(r.doc_id, r.doc_b) for r in j.select("doc_id", "doc_b").distinct().collect()}
        ab = banded.alias("a").join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")))
        exp = {(r[0], r[1]) for r in ab.select(F.col("a.doc_id"), F.col("b.doc_id")).distinct().collect()}
        assert got == exp and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_minhash_lsh_pairs_bucketed_matches_inline_and_no_bucket_shuffle(spark, docs):
    """VERDICT r03 #9: the bucketed PRODUCTION path emits the identical
    pair set as the inline variant, and its physical plan contains NO
    Exchange keyed on (band, bucket) — the candidate self-join runs on
    the bucketed scans' existing distribution (broadcast disabled so
    the small fixture doesn't hide the shape the 100-TB plan takes)."""
    import re

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got_df = dedup.minhash_lsh_pairs_bucketed(
            spark, docs, table_name="t_bands_prod", threshold=0.85)
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"Exchange hashpartitioning\(band#", plan), plan[:2000]
        got = {(r.doc_a, r.doc_b, round(r.j, 12)) for r in got_df.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    exp = {(r.doc_a, r.doc_b, round(r.j, 12))
           for r in dedup.minhash_lsh_pairs(docs, threshold=0.85).collect()}
    assert got == exp and len(got) > 0


def test_wav_codec_roundtrip_and_features(spark):
    """Stdlib RIFF/PCM codec: int16 round trip, stereo collapse by
    exact integer mean, unknown chunks skipped per spec."""
    import struct

    s = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int16)
    blob = multimodal.encode_wav(s, 8000)
    back, rate = multimodal.decode_wav(blob)
    assert rate == 8000 and np.array_equal(back, s)

    # stereo: interleave L/R, decode collapses to integer-mean mono
    inter = np.empty(6, dtype="<i2")
    inter[0::2] = [10, 20, 30]
    inter[1::2] = [30, 40, 51]
    pcm = inter.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    junk = b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # odd len → padded
    body = (b"WAVE" + junk + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    stereo = b"RIFF" + struct.pack("<I", len(body)) + body
    mono, rate2 = multimodal.decode_wav(stereo)
    assert rate2 == 8000 and list(mono) == [20, 30, 40]  # (10+30)/2, (20+40)/2, (30+51)//2

    # features over a Spark column
    df = spark.createDataFrame([("a", bytearray(blob))], "image_id string, bytes binary")
    row = multimodal.audio_features(df).collect()[0]
    assert row.sample_rate == 8000 and row.n_samples == 6
    assert row.sum_sq == int((s.astype(np.int64) ** 2).sum())
    assert row.zero_crossings == int(((s[:-1] < 0) != (s[1:] < 0)).sum())


def test_token_counts_bpe_regex(spark):
    """BPE-ish pre-tokenizer pieces: leading-space word/number/punct
    splits, counted identically to a python re recomputation."""
    import re as _re

    df = spark.createDataFrame(
        [(1, "Hello world, it's 42 tokens!"), (2, "a  b"), (3, "x9y")],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens)
           for r in textstats.token_counts(df).collect()}
    for did, text in [(1, "Hello world, it's 42 tokens!"), (2, "a  b"), (3, "x9y")]:
        ws = len([t for t in text.split(" ") if t])
        bpe = len(_re.findall(textstats.BPE_PATTERN, text))
        assert got[did] == (ws, bpe), (did, got[did], ws, bpe)


def test_pq_encode_recall_and_determinism(spark, emb):
    """Product quantization (Jégou et al. 2011): 64-dim float vectors
    compress to m one-byte codes (16-32×); ADC recall against the
    exact L2 top-k GROWS with the codebook budget — pinned at the two
    ends on the near-orthogonal fixtures (the worst case for any
    quantizer: all pairwise distances nearly equal) — and the whole
    fit→encode→search pipeline is bit-deterministic."""
    allv = {r.vec_id: np.asarray(r.embedding, np.float64) for r in emb.collect()}
    exact5 = {}
    for qid in range(10):
        dv = sorted((np.sum((v - allv[qid]) ** 2), vid)
                    for vid, v in allv.items() if vid != qid)[:5]
        exact5[qid] = {vid for _, vid in dv}

    def run(m, k):
        books = similarity.pq_fit(emb, m=m, k=k, iters=3)
        assert books.shape == (m, k, 64 // m)
        codes = similarity.pq_encode(emb, books)
        q = emb.filter("vec_id < 10")
        got = similarity.pq_topk(codes, q, books, k=5).collect()
        assert len(got) == 50
        hits = sum(len(exact5[qid] & {r.vec_id for r in got if r.query_id == qid})
                   for qid in range(10))
        return books, got, hits / 50

    _, _, r_small = run(8, 64)     # 32× compression → measured ~0.30 here
    books, got, r_big = run(16, 256)  # 16× compression → measured ~0.68
    assert r_big >= 0.6
    assert r_big > r_small  # budget↑ ⇒ recall↑ (the PQ trade-off curve)
    # codes well-formed + determinism across a full re-fit
    rows = similarity.pq_encode(emb, books).collect()
    assert len(rows) == emb.count()
    assert all(len(r.codes) == 16 and all(0 <= c < 256 for c in r.codes) for r in rows[:20])
    again = similarity.pq_topk(
        similarity.pq_encode(emb, similarity.pq_fit(emb, m=16, k=256, iters=3)),
        emb.filter("vec_id < 10"), books, k=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_pq_topk_bulk_matches_collect_path_at_1e4_queries(spark, emb):
    """VERDICT r04 #3: the bulk ADC path (chunked broadcast of RAW
    query vectors, executor-side LUTs) must return results identical
    to the interactive collect-path on a ≥10⁴-query batch — and both
    must be partitioning-independent (the (adc, vec_id) local
    tie-break fix, ADVICE r04)."""
    books = similarity.pq_fit(emb, m=8, k=64, iters=2)
    codes = similarity.pq_encode(emb, books)
    # replicate every fixture vector 20× with shifted ids → 10,000 queries
    q = (emb.select("vec_id", "embedding")
         .crossJoin(spark.range(20).select(F.col("id").alias("rep")))
         .select((F.col("vec_id") + F.col("rep") * 100000).alias("vec_id"),
                 "embedding"))
    nq = q.count()
    assert nq >= 10_000
    a = similarity.pq_topk(codes.repartition(7), q, books, k=5).collect()
    b = similarity.pq_topk_bulk(codes.repartition(7), q, books, k=5, chunk=512).collect()
    assert len(a) == nq * 5
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # different codes partitioning → same ranking (tie determinism)
    c = similarity.pq_topk_bulk(codes.repartition(3), q, books, k=5, chunk=512).collect()
    assert sorted(map(tuple, b)) == sorted(map(tuple, c))


def test_ivf_hint_no_count_during_planning(spark, emb, monkeypatch):
    """VERDICT r04 #4: with a corpus_size hint supplied, deriving
    nlist/nprobe must NEVER fall back to DataFrame.count() — patched
    here to raise, so any plan-time count anywhere in the IVF entry
    point fails loudly. (k-means training jobs are inherent; the full
    corpus count was the avoidable one.)"""
    from pyspark.sql import DataFrame

    def boom(self):
        raise AssertionError("DataFrame.count() triggered during IVF planning")

    monkeypatch.setattr(DataFrame, "count", boom)
    df = similarity.ivf_cosine_topk(emb, emb.filter("vec_id < 5"), k=3,
                                    nlist=None, nprobe=None, iters=1,
                                    corpus_size=500)
    df.schema  # force analysis — still no count()
    assert df.columns == ["query_id", "vec_id", "rank", "cos"]


def test_parquet_row_count_footer_only(spark):
    """tableio.parquet_row_count is the no-Spark-job corpus-size hint
    source: exact row count from parquet footers alone."""
    from rasters_spark import tableio

    n = tableio.parquet_row_count(f"{SF}/embeddings.parquet")
    assert n == spark.read.parquet(f"{SF}/embeddings.parquet").count()


def test_spatial_split_block_coherent_and_deterministic(spark):
    """Every tile of a block shares its split (the no-leakage property),
    the assignment is identical across re-runs (no rand()), a salt
    change re-rolls it, and the holdout fraction is monotone: widening
    0.1 → 0.3 only moves blocks train→val, never back."""
    from rasters_spark.datapipe import split

    t = load_tiles(spark, SF)
    a = split.spatial_split(t, holdout_frac=0.2).select(
        "image_id", "block_x", "block_y", "split")
    rows = a.collect()
    per_block = {}
    for r in rows:
        per_block.setdefault((r.block_x, r.block_y), set()).add(r.split)
    assert all(len(v) == 1 for v in per_block.values())  # block-coherent
    assert {r.split for r in rows} == {"train", "val"}   # both present
    again = {r.image_id: r.split for r in split.spatial_split(t, 0.2).collect()}
    assert again == {r.image_id: r.split for r in rows}  # deterministic
    resalted = {r.image_id: r.split
                for r in split.spatial_split(t, 0.2, salt="v2").collect()}
    assert resalted != again                             # salt re-rolls
    narrow = {r.image_id for r in split.spatial_split(t, 0.1).collect()
              if r.split == "val"}
    wide = {r.image_id for r in split.spatial_split(t, 0.3).collect()
            if r.split == "val"}
    assert narrow < wide                                 # monotone holdout


def test_hash_sample_nested_and_unbiased(spark, docs):
    """The 5% sample is a strict subset of the 20% sample under the
    same salt (composability), and the realized fraction is within
    binomial noise of the target."""
    from rasters_spark.datapipe import split

    small = {r.doc_id for r in split.hash_sample(docs, 0.05, key="doc_id").collect()}
    big = {r.doc_id for r in split.hash_sample(docs, 0.20, key="doc_id").collect()}
    assert small <= big
    n = docs.count()
    got = len(big) / n
    assert abs(got - 0.20) < 4 * (0.2 * 0.8 / n) ** 0.5 + 0.02


def test_cap_per_group_bound_and_total_order(spark):
    """No group exceeds the cap, survivors are exactly the n smallest
    (hash, id) pairs — verified by python recomputation of the same
    md5 arithmetic — and the result is partitioning-invariant."""
    import hashlib

    from rasters_spark.datapipe import split
    from rasters_spark.tiles import tiles_with_cells

    t = tiles_with_cells(load_tiles(spark, SF))
    capped = split.cap_per_group(t, "cell_id", 2).select("cell_id", "image_id")
    got = {(r.cell_id, r.image_id) for r in capped.collect()}
    sizes = {}
    for c, _ in got:
        sizes[c] = sizes.get(c, 0) + 1
    assert max(sizes.values()) <= 2
    full = [(r.cell_id, r.image_id) for r in t.select("cell_id", "image_id").collect()]
    by_cell = {}
    for c, i in full:
        h = int(hashlib.md5(f"{i}|v1".encode()).hexdigest()[:15], 16)
        by_cell.setdefault(c, []).append((h, i))
    expect = {(c, i) for c, hs in by_cell.items() for _, i in sorted(hs)[:2]}
    assert got == expect
    reparted = {(r.cell_id, r.image_id)
                for r in split.cap_per_group(t.repartition(13), "cell_id", 2)
                .select("cell_id", "image_id").collect()}
    assert reparted == got


def test_pack_shards_matches_single_node_brute(spark, docs):
    """The two-phase distributed prefix sum must equal the one-node
    answer: sort ALL docs by (md5 hash, doc_id), exclusive cumsum,
    integer-divide by target."""
    import hashlib

    from rasters_spark.datapipe import shards

    target = 4096
    got = {r.doc_id: r.shard_id
           for r in shards.pack_shards(docs, target).collect()}
    rows = docs.select("doc_id", "n_chars").collect()

    def h60(doc_id):
        return int(hashlib.md5(f"{doc_id}|v1".encode()).hexdigest()[:15], 16)

    ordered = sorted(rows, key=lambda r: (h60(r.doc_id), r.doc_id))
    prefix = 0
    for r in ordered:
        assert got[r.doc_id] == prefix // target, r.doc_id
        prefix += r.n_chars
    assert len(got) == len(rows)
    # shard ids are dense 0..K
    assert set(got.values()) == set(range(max(got.values()) + 1))


def test_pack_shards_partitioning_invariant(spark, docs):
    """Same assignment no matter how the input is partitioned and no
    matter the bucket count — determinism is the whole point."""
    from rasters_spark.datapipe import shards

    a = {r.doc_id: r.shard_id
         for r in shards.pack_shards(docs.repartition(13), 4096,
                                     num_buckets=7).collect()}
    b = {r.doc_id: r.shard_id
         for r in shards.pack_shards(docs.coalesce(1), 4096,
                                     num_buckets=64).collect()}
    assert a == b


def test_pack_shards_size_bounds(spark, docs):
    """Every shard's payload is within target ± max_doc (the final
    shard may be smaller)."""
    from rasters_spark.datapipe import shards

    target = 4096
    out = shards.pack_shards(docs, target)
    sizes = {r.shard_id: r.tot for r in
             out.groupBy("shard_id").agg(F.sum("n_chars").alias("tot")).collect()}
    max_doc = docs.agg(F.max("n_chars")).first()[0]
    last = max(sizes)
    for sid, tot in sizes.items():
        assert tot < target + max_doc, (sid, tot)
        if sid != last:
            assert tot > target - max_doc, (sid, tot)


def test_pack_shards_determinism_stress(spark, docs):
    """Round-6 hardening (VERDICT r05 #2): bucket assignment is now
    exact int64 `div` — the former double division fed a ~2^60 key
    through a 53-bit mantissa, so boundary buckets depended on FP
    rounding. Stress: repeated runs x partitionings x bucket counts
    must produce ONE identical full-output hash, and the bucket id must
    equal exact integer division for keys AT bucket-span boundaries."""
    import hashlib

    from rasters_spark.datapipe import shards

    hashes = set()
    for parts in (1, 8, 64):
        for _ in range(2):
            rows = sorted(
                (r.doc_id, r.n_chars, r.shard_id)
                for r in shards.pack_shards(docs.repartition(parts), 4096,
                                            num_buckets=16).collect())
            hashes.add(hashlib.sha256(str(rows).encode()).hexdigest())
    assert len(hashes) == 1
    # white-box boundary exactness: _pid computed by the plan equals
    # python's exact // for keys straddling a bucket-span boundary
    span = ((1 << 60) + 63) // 64
    edge = spark.createDataFrame(
        [(k,) for k in (span - 1, span, span + 1, 53 * span - 1, 53 * span)],
        "hk long")
    got = {r.hk: r.pid for r in
           edge.select("hk", F.expr(f"hk div {span}").alias("pid")).collect()}
    assert got == {k: k // span for k in got}


def test_doc_repetition_brute(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a"),        # bigrams: ab,ba,ab,ba -> 4 grams, 2 distinct, top 2
         (2, "x y z"),            # xy,yz -> all unique
         (3, "q q q q"),          # qq x3 -> top_frac 1.0 after dedup? no: 3 grams 1 distinct
         (4, "solo")],            # < 2 tokens -> no row
        "doc_id long, text string")
    got = {r.doc_id: r for r in textstats.doc_repetition(docs, 2).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1].n_grams, got[1].n_distinct, got[1].top_cnt) == (4, 2, 2)
    assert got[1].dup_frac == 0.5 and got[1].top_frac == 0.5
    assert (got[2].n_grams, got[2].n_distinct, got[2].top_cnt) == (2, 2, 1)
    assert got[2].dup_frac == 0.0
    assert (got[3].n_grams, got[3].n_distinct, got[3].top_cnt) == (3, 1, 3)
    assert got[3].dup_frac == pytest.approx(2 / 3) and got[3].top_frac == 1.0


def test_decontaminate_brute(spark):
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string")
    tr = spark.createDataFrame(
        [(1, "see the quick brown fox jumps far"),  # 2 distinct shared 4-grams
         (2, "the quick brown dog"),                # no shared 4-gram
         (3, "the quick brown fox the quick brown fox")],  # 1 shared gram x2 + qbf-the... check
        "doc_id long, text string")
    got = {r.doc_id: (r.n_overlap_grams, r.n_overlap_instances)
           for r in textstats.decontaminate(tr, ev, 4).collect()}
    # doc 1: grams {see-the-quick-brown, the-quick-brown-fox, quick-brown-fox-jumps,
    #               brown-fox-jumps-far} -> shared: the-quick-brown-fox, quick-brown-fox-jumps
    assert got[1] == (2, 2)
    assert 2 not in got
    # doc 3: the-quick-brown-fox appears twice -> 1 distinct gram, 2 instances
    assert got[3] == (1, 2)


def test_point_chips_clamped_window_brute(spark):
    """Chip stats vs decoding the tile directly: interior point (full
    5x5), corner point (clamped 3x3), and a NaN in the window."""
    from rasters_spark.datapipe import chips as chipmod

    arr = (np.arange(64, dtype=np.float32).reshape(8, 8)) * 0.25
    arr[2, 3] = np.nan
    rows = [("t", codec.encode_tile(arr, "raw"), 8, 8, "raw",
             7, 0.0, 0.0, 3, 3),    # interior: rows/cols 1..5
            ("t", codec.encode_tile(arr, "raw"), 8, 8, "raw",
             8, 0.0, 0.0, 0, 0)]    # corner: rows/cols 0..2
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "point_id long, x double, y double, prow int, pcol int")
    got = {r.point_id: r for r in chipmod.point_chips(df, 2).collect()}
    win = arr[1:6, 1:6].astype(np.float64)
    m = np.isfinite(win)
    r7 = got[7]
    assert (r7.chip_w, r7.chip_h) == (5, 5)
    assert r7.n_valid == int(m.sum())
    assert r7.vsum == float(win[m].sum())
    assert (r7.vmin, r7.vmax) == (float(win[m].min()), float(win[m].max()))
    r8 = got[8]
    cw = arr[0:3, 0:3].astype(np.float64)
    cm = np.isfinite(cw)
    assert (r8.chip_w, r8.chip_h) == (3, 3)
    assert (r8.n_valid, r8.vsum) == (int(cm.sum()), float(cw[cm].sum()))


def test_quality_filter_cascade(spark):
    docs = spark.createDataFrame(
        [(1, "short doc"),                                   # too_short
         (2, " ".join(["a b"] * 20)),                        # repetitive bigrams
         (3, " ".join(f"w{i}" for i in range(30))),          # clean
         ],
        "doc_id long, text string")
    got = {r.doc_id: r for r in __import__("rasters_spark.datapipe.textstats",
                                           fromlist=["x"]).quality_filter(docs).collect()}
    assert got[1].keep is False and got[1].reason == "too_short"
    assert got[2].keep is False and got[2].reason == "repetitive"
    assert got[3].keep is True and got[3].reason is None
    # precedence: a short AND repetitive doc reports too_short first
    d = spark.createDataFrame([(9, "x x x x")], "doc_id long, text string")
    r = __import__("rasters_spark.datapipe.textstats",
                   fromlist=["x"]).quality_filter(d).collect()[0]
    assert r.reason == "too_short"


def test_lattice_chips_cross_seam(spark):
    """A probe at a tile's right edge must include the neighbor tile's
    pixels via the halo — compare against the assembled global array."""
    from rasters_spark.datapipe import chips as chipmod
    from tests.test_focal import _lattice_rows, _global_array, COLS, H, W

    lattice = spark.createDataFrame(_lattice_rows(), COLS)
    g = _global_array()
    got = {(r.gx, r.gy): (r.n_valid, r.vsum, r.vmin, r.vmax)
           for r in chipmod.lattice_chips(lattice, 2, 3).collect()}
    gh, gw = g.shape
    n_cross = 0
    for gy in range(0, gh, 3):
        for gx in range(0, gw, 3):
            if not np.isfinite(g[gy, gx]):
                assert (gx, gy) not in got
                continue
            win = g[max(gy - 2, 0):gy + 3, max(gx - 2, 0):gx + 3]
            m = np.isfinite(win)
            v = win[m].astype(np.float64)
            assert got[(gx, gy)] == (int(m.sum()), float(v.sum()),
                                     float(v.min()), float(v.max())), (gx, gy)
            # does this chip cross a tile seam?
            if (gx % W) in (0, 1, W - 2, W - 1) or (gy % H) in (0, 1, H - 2, H - 1):
                n_cross += 1
    assert n_cross > 0  # seam chips were actually exercised
