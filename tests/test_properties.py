"""Property-style checks (SURVEY.md §5.5) — cheap invariants that hold
regardless of fixture data."""

from __future__ import annotations

from pyspark.sql import functions as F

from deltasink_spark import registry
from deltasink_spark.operators.vectors import cosine
from deltasink_spark.tables import load

registry.load_all()


def test_dedup_output_has_no_duplicate_keys(spark, sf_small):
    out = registry.QUERIES["dedup_exact_hash"](spark, sf_small)
    assert out.count() == out.select("content_sha").distinct().count()


def test_topk_per_group_size_bounded(spark, sf_small):
    out = registry.QUERIES["topk_per_group"](spark, sf_small)
    sizes = out.groupBy("c_custkey").count().agg(F.max("count")).first()[0]
    assert sizes <= 3


def test_cosine_self_is_one(spark, sf_small):
    e = load(spark, sf_small, "embeddings").limit(20)
    vals = e.select(cosine(F.col("embedding"), F.col("embedding")).alias("c")).collect()
    assert all(abs(r["c"] - 1.0) < 1e-5 for r in vals)


def test_union_distinct_cardinality(spark, sf_small):
    out = registry.QUERIES["set_union"](spark, sf_small)
    c = load(spark, sf_small, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").count()
    b = c.filter(F.col("c_acctbal") > 5000).count()
    assert out.count() <= a + b


def test_rng_sample_seeded_and_bounded(spark, sf_small):
    """The rng-seeded .sample() variant (the hash-based deterministic
    sample is the registered sample_frac op): same seed -> same rows,
    fraction roughly honored."""
    li = load(spark, sf_small, "lineitem")
    a = li.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber")
    b = li.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    n, total = a.count(), li.count()
    assert 0.04 * total < n < 0.2 * total


def test_documents_fixture_is_ascii(spark, sf_small):
    """multimodal_resize/frame_sample oracles rely on byte-truncation ==
    char-truncation: every fixture doc must be pure ASCII."""
    d = load(spark, sf_small, "documents")
    n_bad = d.filter(F.octet_length("text") != F.length("text")).count()
    assert n_bad == 0


def test_raw_array_surfaces(spark, sf_small):
    """The registered fn_array/fn_map/text_tokenize/text_ngrams ops
    stringify their array outputs for the driver canonicalizer; the raw
    array/map surfaces stay exercised here."""
    from deltasink_spark.operators.text import tokenize, word_ngrams

    d = load(spark, sf_small, "documents").limit(50)
    toks = F.split(F.col("text"), " ")
    rows = d.select(
        F.slice(F.sort_array(toks), 1, 3).alias("first3"),
        F.size(toks).alias("n_raw"),
        tokenize(F.col("text")).alias("tokens"),
        word_ngrams(toks, 2).alias("bigrams"),
        F.map_keys(
            F.create_map(F.lit("a"), F.col("doc_id"), F.lit("b"), F.col("doc_id"))
        ).alias("mkeys"),
    ).collect()
    for r in rows:
        assert isinstance(r["first3"], list) and len(r["first3"]) <= 3
        assert r["first3"] == sorted(r["first3"])
        assert isinstance(r["tokens"], list)
        assert len(r["bigrams"]) == max(r["n_raw"] - 1, 0)
        assert sorted(r["mkeys"]) == ["a", "b"]


def test_simhash_near_dups_have_small_hamming(spark, sf_small):
    """Pairs found by MinHash (J >= 0.6) must also be close in SimHash
    space (Hamming <= 16 of 64 bits) — cross-validates both sketches."""
    pairs = registry.QUERIES["dedup_minhash_lsh"](spark, sf_small)
    sims = registry.QUERIES["dedup_simhash"](spark, sf_small)
    sa = sims.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha"))
    sb = sims.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb"))
    joined = pairs.join(sa, "id_a").join(sb, "id_b")
    ham = joined.select(
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("d")
    )
    rows = ham.collect()
    assert rows, "expected at least one near-dup pair in fixtures"
    assert all(r["d"] <= 16 for r in rows)


def test_minhash_lsh_finds_planted_pairs(spark, sf_small):
    out = registry.QUERIES["dedup_minhash_lsh"](spark, sf_small).collect()
    assert len(out) > 0
    assert all(r["jaccard"] >= 0.6 for r in out)


def test_knn_join_k_bound_and_self_excluded(spark, sf_small):
    out = registry.QUERIES["sim_topk_join"](spark, sf_small).collect()
    per_q: dict[int, int] = {}
    for r in out:
        assert r["qid"] != r["vec_id"]
        per_q[r["qid"]] = per_q.get(r["qid"], 0) + 1
    assert all(v <= 3 for v in per_q.values()) and len(per_q) == 5


def test_hll_estimate_accuracy(spark, sf_small):
    """The op self-asserts the 3-sigma envelope via within_band; the
    raw-estimate accuracy is re-derived here independently."""
    from pyspark.sql import functions as F

    from deltasink_spark import registry
    from deltasink_spark.tables import load

    rows = registry.QUERIES["agg_hll_sketch"](spark, sf_small).collect()
    assert rows and all(r["within_band"] for r in rows)
    o = load(spark, sf_small, "orders")
    c = load(spark, sf_small, "customer").select("c_custkey", "c_mktsegment")
    raw = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", F.lit(14))).alias("est"),
            F.count_distinct("o_custkey").alias("ex"),
        )
        .collect()
    )
    for r in raw:
        assert abs(r["est"] - r["ex"]) / max(r["ex"], 1) < 0.05, r


def test_hll_partial_merge_matches_whole(spark, sf_small):
    """Distributed-merge soundness: union of disjoint partial sketches
    must estimate (nearly) the same as one sketch over the whole table
    — the union gadget is not register-identical (observed at sf0.1)."""
    from deltasink_spark import registry

    r = registry.QUERIES["agg_hll_union"](spark, sf_small).collect()[0]
    assert r["merged_close_to_whole"] and r["merged_within_band"]


def test_approx_distinct_accuracy(spark, sf_small):
    from deltasink_spark import registry

    rows = registry.QUERIES["agg_approx_distinct"](spark, sf_small).collect()
    assert rows and all(r["within_band"] for r in rows)


def test_word_ngrams_short_docs_yield_empty(spark):
    """Docs with fewer than n tokens must produce an EMPTY gram array,
    not an INVALID_ARRAY_INDEX_IN_ELEMENT_AT crash (sequence(1, 0)
    auto-steps DOWN in Spark). Regression for the r1 advisor finding."""
    from deltasink_spark.operators.text import tokenize, word_ngrams

    df = spark.createDataFrame(
        [("one",), ("two words",), ("now three tokens",), ("",), (None,)],
        ["text"],
    )
    rows = df.select(
        word_ngrams(tokenize(F.col("text")), 3).alias("grams")
    ).collect()
    got = [r["grams"] for r in rows]
    assert got[0] == [] and got[1] == []
    assert got[2] == ["now three tokens"]
    assert got[3] == [] and got[4] == []


def test_agg_collect_and_features_outputs_are_scalar(spark, sf_small):
    """Driver-harness compatibility: no array-typed cells in any
    driver-facing output (the canonicalizer cannot hash ndarray cells).
    Regression for the two r1 driver ERRs."""
    for op in ("agg_collect", "multimodal_features"):
        df = registry.QUERIES[op](spark, sf_small)
        kinds = [f.dataType.typeName() for f in df.schema.fields]
        assert not any(k in ("array", "map", "struct") for k in kinds), (op, kinds)
        df.limit(5).collect()


def test_extract_features_raw_arrays(spark, sf_small):
    """The raw array<float> feature path (input shape for similarity
    ops) still works under the digested driver-facing op."""
    from deltasink_spark.operators.multimodal import extract_features, pack_media

    d = load(spark, sf_small, "documents").limit(50)
    packed = d.select(
        "doc_id",
        pack_media(
            F.encode(F.col("text"), "utf-8"), F.lit("text/plain;doc"), F.col("source")
        ).alias("media"),
    )
    rows = extract_features(packed, "media", "doc_id").collect()
    assert len(rows) == 50
    assert all(len(r["features"]) == 16 for r in rows)


def test_seq_pack_invariants(spark, sf_small):
    """Packing bookkeeping must be internally consistent: offsets stay
    inside the budget, seq ids start at 0 per source and never skip
    (every sequence boundary is crossed by some doc), and the packed
    token order reproduces the per-source cumsum."""
    from deltasink_spark.queries.llmprep import SEQ_BUDGET

    rows = registry.QUERIES["seq_pack"](spark, sf_small).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, docs in by_src.items():
        docs.sort(key=lambda r: r["doc_id"])
        cum = 0
        prev_seq = 0
        for r in docs:
            assert 0 <= r["seq_offset"] < SEQ_BUDGET, r
            assert r["seq_id"] == cum // SEQ_BUDGET, r
            assert r["seq_offset"] == cum % SEQ_BUDGET, r
            assert r["seq_id"] - prev_seq <= (r["n_tokens"] // SEQ_BUDGET) + 1
            prev_seq = r["seq_id"]
            cum += r["n_tokens"]


def test_dedup_cluster_is_transitive_and_minimal(spark, sf_small):
    """Cluster labels must form proper connected components over the
    near-dup pair graph: both endpoints of every pair share a label,
    and every label is the minimum doc_id of its member set."""
    from deltasink_spark.operators.minhash import minhash_dedup_pairs
    from deltasink_spark.tables import load as _load

    d = _load(spark, sf_small, "documents")
    pairs = minhash_dedup_pairs(d, "doc_id", "text", n=3, threshold=0.6).collect()
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in registry.QUERIES["dedup_cluster"](spark, sf_small).collect()
    }
    for p in pairs:
        assert labels[p["id_a"]] == labels[p["id_b"]], p
    members = {}
    for doc, lbl in labels.items():
        members.setdefault(lbl, []).append(doc)
    for lbl, docs in members.items():
        assert lbl == min(docs), (lbl, docs)


def test_ann_ivf_recall_vs_exact(spark, sf_small):
    """The IVF approximation must stay useful: against brute-force
    top-3 (sim_topk_join ground truth at k=3), pooled recall >= 0.5
    on the fixture (sanity floor, not a tuning target)."""
    ivf = registry.QUERIES["ann_ivf"](spark, sf_small).collect()
    exact = registry.QUERIES["sim_topk_join"](spark, sf_small).collect()
    ivf_set = {(r["qid"], r["vec_id"]) for r in ivf}
    exact_set = {(r["qid"], r["vec_id"]) for r in exact}
    recall = len(ivf_set & exact_set) / len(exact_set)
    assert recall >= 0.5, recall


def test_contamination_eval_docs_fully_contaminated(spark, sf_small):
    """Sanity: a doc that IS in the eval split never appears in the
    train-side output; and any train doc sharing >=5% of its grams is
    flagged while zero-overlap docs are not."""
    rows = registry.QUERIES["contamination_check"](spark, sf_small).collect()
    for r in rows:
        assert r["doc_id"] % 37 != 0
        assert r["contaminated"] == (r["n_hits"] * 20 >= r["n_grams"])


def test_events_loader_handles_any_fixture_ts_encoding(spark, tmp_path):
    """The fixture generator has shipped events.ts as TIMESTAMP(NANOS)
    and as TIMESTAMP(MICROS) across rounds; the r3 bench crash was the
    loader assuming one of them. load() must branch on the actual
    footer and always yield an instant TimestampType with identical
    values."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampType

    from deltasink_spark.tables import load

    rows = [
        datetime.datetime(2024, 1, 1, 0, 0, 0, 123456),
        datetime.datetime(2024, 6, 15, 12, 30, 45, 654321),
    ]
    base = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
    }
    for unit in ("us", "ns"):
        d = tmp_path / unit
        d.mkdir()
        tbl = pa.table({**base, "ts": pa.array(rows, pa.timestamp(unit))})
        pq.write_table(tbl, str(d / "events.parquet"))
        df = load(spark, str(d), "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType), unit
        got = sorted(r.ts for r in df.select("ts").collect())
        assert got == rows, unit


def test_fanout_is_identity_off_local_profile(spark, sf_small, monkeypatch):
    from deltasink_spark.tables import fanout, load

    monkeypatch.setenv("DS_LOCAL_PROFILE", "0")
    df = load(spark, sf_small, "region")
    assert fanout(df) is df
    monkeypatch.delenv("DS_LOCAL_PROFILE")
    assert fanout(df) is not df


def test_large_small_star_components_match_union_find(spark):
    """large-star/small-star must agree with a driver-side union-find
    on an adversarial mix: a long chain (worst case for plain label
    propagation), a star, a cycle, and random edges."""
    import random

    from deltasink_spark.queries.llmprep import min_label_components

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(100, 140)]          # 41-node chain
    edges += [(500, x) for x in range(501, 511)]           # star
    edges += [(200, 201), (201, 202), (202, 200)]          # cycle
    nodes = list(range(1000, 1060))
    edges += [tuple(rng.sample(nodes, 2)) for _ in range(80)]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r.doc_id: r.cluster_id for r in min_label_components(df).collect()
    }
    assert got == expect


def test_multimodal_codec_gating_deterministic_fallback():
    """The codec import-gate contract: non-media payloads (the fixture
    bytes) must take the deterministic structural path in EVERY
    environment — with or without PIL/av installed — so the registered
    oracles never depend on codec availability; when PIL is present,
    real image bytes get a real decode through the same functions."""
    from deltasink_spark.operators import multimodal as mm

    junk = bytes(range(256)) + b"\x00" * 44  # 300 bytes, not an image
    assert mm._fake_decode(junk) == (64 + 300 % 256, 64 + (300 // 256) % 256, True)
    assert mm._fake_decode(None) == (0, 0, False)
    assert mm._resize_payload(junk, 4, 4) == junk[:16]
    frames = mm._demux_frames(b"x" * 1024, every_n=4, frame_bytes=256)
    assert [f[0] for f in frames] == [0]  # 4 chunks, every 4th -> frame 0
    assert frames[0][1] == b"x" * 256 and frames[0][2] == 0

    if mm._PIL_Image is not None:  # real-codec path, engaged only off-fixture
        import io

        im = mm._PIL_Image.new("RGB", (20, 10))
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        assert mm._fake_decode(buf.getvalue()) == (20, 10, True)


def test_megacluster_skew_candidates_linear_and_log_rounds(spark, sf_small):
    """Adversarial-skew proof for the dedup stack: 10^4 documents
    sharing one boilerplate template (the pathological crawl cluster).
    Without the LSH bucket cap the band self-join would expand this to
    ~N^2/2 = 5*10^7 candidate pairs; with star-expansion
    (minhash.py::lsh_candidates) the candidate count must stay LINEAR
    in N, the component clustering must still connect the whole
    cluster, and the alternating-star rounds must stay within the
    O(log2 n) bound. The 100 TB claims rest on exactly these three
    bounds — clean-ish fixture distributions never exercise them."""
    import math

    from deltasink_spark.operators.minhash import (
        lsh_candidates,
        minhash_signatures,
        shingle_table,
    )
    from deltasink_spark.queries.llmprep import min_label_components

    n = 10_000
    template = (
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
        "eiusmod tempor incididunt ut labore et dolore magna aliqua"
    )
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(template + " tail"), (F.col("id") % 5).cast("string")).alias(
            "text"
        ),
    )
    sh = shingle_table(docs, "doc_id", "text", 3).localCheckpoint(eager=False)
    cand = lsh_candidates(minhash_signatures(sh, "doc_id"), "doc_id")
    n_cand = cand.count()
    # (a) linear bound: star edges per oversized bucket ~= N per band;
    # 8 bands + small-bucket all-pairs slack => well under 32*N, and
    # catastrophically under the ~5e7 all-pairs blowup
    assert n_cand <= 32 * n, f"candidate blowup: {n_cand}"
    assert n_cand >= n - 5  # the cluster is still fully covered
    # (b) one component, log-bounded rounds
    stats: dict = {}
    comp = min_label_components(cand, stats=stats)
    assert comp.select("cluster_id").distinct().count() == 1
    assert comp.count() == n
    assert stats["rounds"] <= math.log2(n) + 4, stats
    # (c) the keeper stage stays a hash agg (never a per-cluster
    # window, which would sort the mega-cluster on one task)
    from tests.test_plans import plan

    p = plan(registry.QUERIES["dedup_apply_keep_best"](spark, sf_small))
    assert "Window" not in p
    # MAX(struct) keeper compiles to SortAggregate (struct ordering is
    # not hash-aggregable) — still a combining agg, never a window
    assert "Aggregate" in p


def test_hilbert_unroll_matches_recursive_reference_and_adjacency():
    """hilbert_cluster's unrolled SQL (the Spark projections and the
    DuckDB oracle share _hilbert_exprs) must equal the textbook
    recursive xy2d on random points, and the curve must have the
    Hilbert adjacency property (consecutive d -> Manhattan-distance-1
    cells) — the locality guarantee Z-order lacks."""
    import random

    import duckdb

    from deltasink_spark.queries.relational import _H_BITS, _H_N, _hilbert_exprs

    def xy2d(x, y):
        d, s = 0, _H_N // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = _H_N - 1 - x, _H_N - 1 - y
                x, y = y, x
            s //= 2
        return d

    # (a) unrolled SQL == recursive reference, via DuckDB
    rng = random.Random(7)
    pts = [(rng.randrange(_H_N), rng.randrange(_H_N)) for _ in range(300)]
    pts += [(0, 0), (_H_N - 1, _H_N - 1), (0, _H_N - 1), (_H_N - 1, 0)]
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    ctes = ["h0 AS (SELECT x, y, x AS hx, y AS hy, CAST(0 AS BIGINT) AS hd FROM pts)"]
    lvl, s = 0, _H_N // 2
    while s > 0:
        lvl += 1
        xn, yn, dinc = _hilbert_exprs(s)
        ctes.append(
            f"h{lvl} AS (SELECT x, y, {xn} AS hx, {yn} AS hy, hd + {dinc} AS hd FROM h{lvl-1})"
        )
        s //= 2
    rows = con.execute(
        f"WITH {', '.join(ctes)} SELECT x, y, hd FROM h{lvl}"
    ).fetchall()
    assert all(hd == xy2d(x, y) for x, y, hd in rows)

    # (b) adjacency: walk a contiguous d range via the inverse map and
    # check each step moves exactly one cell
    def d2xy(d):
        x = y = 0
        t, s = d, 1
        while s < _H_N:
            rx = 1 & (t // 2)
            ry = 1 & (t ^ rx)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            x += s * rx
            y += s * ry
            t //= 4
            s *= 2
        return x, y

    start = rng.randrange(_H_N * _H_N - 2000)
    walk = [d2xy(d) for d in range(start, start + 2000)]
    for (x0, y0), (x1, y1) in zip(walk, walk[1:]):
        assert abs(x0 - x1) + abs(y0 - y1) == 1
    # and the forward map inverts the walk
    assert all(xy2d(x, y) == start + i for i, (x, y) in enumerate(walk[:50]))


def test_phash_megabucket_skew_candidates_linear(spark):
    """Adversarial-skew proof for dedup_image_phash: 5,000 identical
    payloads (the mono-color crawl) collapse every band to one bucket;
    the star cap must keep the pair count LINEAR in N (not N^2/2), and
    since identical payloads have hamming 0, every member must still
    pair with the hub — connectivity survives the cap."""
    from deltasink_spark.queries.dedup import (
        _PH_BANDS,
        _phash_pairs,
        _phash_sql,
        _ph_px_spark,
    )

    n = 5_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("mono mono mono mono mono mono mono mono mono mono").alias("text"),
    )
    ph = docs.select("doc_id", F.expr(_phash_sql(_ph_px_spark)).alias("phash"))
    pairs = _phash_pairs(ph)
    n_pairs = pairs.count()
    # star expansion: <= one hub edge per member per band (dedup'd
    # across bands), catastrophically under the ~1.25e7 all-pairs blowup
    assert n_pairs <= _PH_BANDS * n, f"candidate blowup: {n_pairs}"
    assert n_pairs == n - 1  # every member reaches the hub exactly once
    # identical payloads -> all surviving pairs are exact dups
    assert pairs.filter(F.col("hamming") != 0).count() == 0


def test_triangle_orientation_matches_naive_count(spark, sf_small):
    """The degree-ordered-orientation triangle count equals a naive
    canonical a<b<c triple join. This pins the orientation-order
    subtlety: wedge endpoints must be compared in the SAME (degree,
    id) order that directed the edges — comparing raw ids undercounts
    whenever degree order disagrees with id order (it does on this
    fixture: the id-ordered variant reports 28 instead of 61 at
    sf0.01)."""
    from deltasink_spark.queries.analytics import _coorder_edges

    e = _coorder_edges(spark, sf_small)  # already checkpointed (cache)
    e1 = e.select(F.col("s1").alias("a"), F.col("s2").alias("b"))
    e2 = e.select(F.col("s1").alias("b"), F.col("s2").alias("c"))
    e3 = e.select(F.col("s1").alias("a"), F.col("s2").alias("c"))
    naive = e1.join(e2, "b").join(e3, ["a", "c"]).count()
    got = registry.QUERIES["graph_triangle_count"](spark, sf_small).first()
    assert got["n_triangles"] == naive
    assert naive > 0  # vacuous-pin guard: the fixture graph has triangles


def test_interval_overlap_decomposition_matches_cross_join(spark):
    """The bucket-decomposed interval join must equal a brute cross
    join + overlap filter for ANY width, on intervals crafted to hit
    the decomposition's corners: bucket-boundary straddles, nested
    (swallowed) intervals, identical intervals on both sides, touching
    endpoints, zero-length intervals, multi-bucket spans."""
    from deltasink_spark.queries.joins import interval_overlap_pairs

    a_rows = [(1, 0, 0), (2, 6, 8), (3, 13, 14), (4, 0, 20), (5, 7, 7),
              (6, 21, 23), (7, 13, 14), (8, 10, 5)]
    b_rows = [(10, 0, 0), (11, 7, 13), (12, 14, 14), (13, 5, 6),
              (14, 20, 21), (15, 13, 14), (16, 9, 2)]
    a = spark.createDataFrame(a_rows, "a_key long, a_s long, a_e long")
    b = spark.createDataFrame(b_rows, "b_key long, b_s long, b_e long")
    # inverted rows (s > e) are EMPTY intervals: they match nothing
    # (sequence() would step downward and fabricate buckets otherwise)
    expect = sorted(
        (ak, bk)
        for ak, as_, ae in a_rows
        for bk, bs, be in b_rows
        if as_ <= ae and bs <= be and as_ <= be and bs <= ae
    )
    for width in (1, 3, 7, 50):
        got = sorted(
            (r["a_key"], r["b_key"])
            for r in interval_overlap_pairs(a, b, width).collect()
        )
        assert got == expect, f"width={width}"


def test_merge_islands_matches_sequential_reference(spark):
    """The running-max islands must match a sequential sweep on inputs
    with swallowed intervals (a long first interval covering later
    short ones — the case a lag-based flag gets wrong), touching-not-
    overlapping endpoints, duplicates, and singleton keys."""
    from deltasink_spark.queries.windows import merge_islands

    rows = [
        # key 1: [0,9] swallows [2,3] and [5,6]; [10,11] touches 9+1
        (1, 0, 9, 1), (1, 2, 3, 2), (1, 5, 6, 3), (1, 10, 11, 4),
        # key 2: duplicates and an overlap chain
        (2, 0, 2, 1), (2, 0, 2, 2), (2, 2, 4, 3), (2, 7, 8, 4),
        # key 3: singleton
        (3, 100, 100, 1),
    ]
    iv = spark.createDataFrame(rows, "key long, s long, e long, tb long")
    got = {
        (r["key"], r["island_start"], r["island_end"])
        for r in merge_islands(iv).collect()
    }

    def reference(intervals):
        out = []
        for key in {k for k, *_ in intervals}:
            ivs = sorted((s, e) for k, s, e, _ in intervals if k == key)
            cur_s, cur_e = ivs[0]
            for s, e in ivs[1:]:
                if s <= cur_e:
                    cur_e = max(cur_e, e)
                else:
                    out.append((key, cur_s, cur_e))
                    cur_s, cur_e = s, e
            out.append((key, cur_s, cur_e))
        return set(out)

    assert got == reference(rows)


def test_star_pairs_verified_at_lowered_threshold(spark):
    """Star-tagged candidates (oversized LSH buckets) must be held to
    threshold/2 — not exempted (one shared r=2 band is weak evidence,
    P(collision) ~ J^2, so exemption admits boilerplate-collision
    false pairs into the dedup clusters) and not the full threshold
    (the hub edge is a capped member's only path into its cluster).
    Controlled shingle sets: J=1.0, J=1/3, J=0 against a 0.6 bar."""
    from deltasink_spark.operators.minhash import jaccard_verify

    sh_rows = (
        [(0, f"s{i}") for i in range(10)]          # hub
        + [(1, f"s{i}") for i in range(10)]        # J(0,1) = 1.0
        + [(2, f"s{i}") for i in range(5)]
        + [(2, f"t{i}") for i in range(5)]         # J(0,2) = 5/15 = 0.333
        + [(3, f"u{i}") for i in range(10)]        # J(0,3) = 0.0
    )
    sh = spark.createDataFrame(sh_rows, "doc_id long, shingle string")

    def pairs(star: bool):
        cand = spark.createDataFrame(
            [(0, 1, star), (0, 2, star), (0, 3, star)],
            "id_a long, id_b long, is_star boolean",
        )
        got = jaccard_verify(cand, sh, "doc_id", 0.6).collect()
        return {(r["id_a"], r["id_b"]) for r in got}

    # star bar = 0.3: the exact dup and the borderline J=0.333 pair
    # survive; the disjoint hash-collision pair is pruned (precision)
    assert pairs(True) == {(0, 1), (0, 2)}
    # ordinary bar = 0.6: only the exact dup survives
    assert pairs(False) == {(0, 1)}


def test_simhash_megabucket_skew_candidates_linear(spark):
    """Adversarial-skew proof for eval_simhash_banding's candidate
    stage: 5,000 identical docs hash to ONE simhash, collapsing every
    band to a single bucket. The star cap must keep the verified pair
    count LINEAR in N (not N^2/2 ~ 1.25e7), and since identical hashes
    have Hamming 0 every member must still reach the hub —
    connectivity survives the cap."""
    from deltasink_spark.queries.dedup import _simhash_band_pairs

    n = 5_000
    sh = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(123456789).cast("long").alias("simhash"),
    )
    pairs = _simhash_band_pairs(sh)
    n_pairs = pairs.count()
    assert n_pairs <= 4 * n, f"candidate blowup: {n_pairs}"
    assert n_pairs == n - 1  # every member reaches the hub exactly once


def test_simhash_band_pairs_distinct(spark):
    """Pin the distinct-set CONTRACT of _simhash_band_pairs (see its
    docstring): eval_simhash_banding's tagged-union aggregation counts
    n_pred as a sum over max-merged pair tags, which equals the
    oracle's COUNT(*) only when the pair frame is a set. Two docs with
    the SAME simhash collide in all 4 bands, so without the trailing
    distinct each pair would surface 4x."""
    from deltasink_spark.queries.dedup import _simhash_band_pairs

    sh = spark.range(8).select(
        F.col("id").alias("doc_id"),
        F.lit(987654321).cast("long").alias("simhash"),
    )
    rows = _simhash_band_pairs(sh).collect()
    pairs = [(r.id_a, r.id_b) for r in rows]
    assert len(pairs) == len(set(pairs)), "pair frame is not a distinct set"
    # 8 identical hashes -> all 28 ordered pairs, each exactly once
    assert sorted(pairs) == [(a, b) for a in range(8) for b in range(a + 1, 8)]


def test_exact_dedup_megacluster_skew_no_window(spark, tmp_path):
    """Adversarial-skew proof for the exact-dedup keep-first stage
    (dedup_exact_hash and pipeline_llm_prep's dedup stage): 20,000
    byte-identical docs land on ONE content hash. The keep-first must
    be the map-side-combinable MIN(struct) hash-agg — the former
    row_number() window would sort the whole cluster inside one task.
    Proof both ways: (a) the optimized plans carry NO Window node on
    the dedup path, (b) the mega-cluster collapses to its min doc_id."""
    from deltasink_spark import registry

    dup = (
        "the quick brown fox jumps over the lazy dog and runs to town "
        "every single day without fail"
    )
    other = (
        "completely different second document about the weather and "
        "ships sailing across a calm blue sea at dawn"
    )
    n = 20_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 7, F.lit(other)).otherwise(F.lit(dup)).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    sf = str(tmp_path)

    out = registry.QUERIES["dedup_exact_hash"](spark, sf)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan, plan
    rows = {r["doc_id"] for r in out.collect()}
    assert rows == {0, 7}  # min of the mega-cluster + the singleton

    pipe = registry.QUERIES["pipeline_llm_prep"](spark, sf)
    pplan = pipe._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in pplan, pplan
    summary = pipe.collect()
    assert len(summary) == 1
    assert summary[0]["n_docs"] == 2  # cluster -> 1 survivor + the other doc
