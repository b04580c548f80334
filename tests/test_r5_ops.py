"""Invariant tests for the r5 operator wave: exact-substring dedup,
semantic (SemDeDup) dedup, ANN recall gate, model-based quality
filtering, and the per-source epoch plan."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] if len(r) > 2 else "en" for r in rows], pa.string()),
            "source": pa.array(
                [r[3] if len(r) > 3 else "synthetic" for r in rows], pa.string()
            ),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_exact_substring_catches_planted_span(spark, tmp_path):
    """Two documents sharing a 16-word verbatim span must both be
    flagged even though the span sits at DIFFERENT offsets in each
    (the content-defined-alignment guarantee); fully unique documents
    must not appear."""
    from parquet_batch_spark.operators.dedup import dedup_exact_substring

    span = (
        "this exact licensing paragraph is reproduced verbatim across "
        "two otherwise unrelated documents in the corpus today"
    )  # 16 words >= SUBSTR_K
    rows = [
        (0, "totally unique document zero with its own words entirely alone here"),
        (1, "intro one. " + span + " outro one."),
        (2, "a different intro two goes here. " + span + " tail two."),
        (3, "another fully unique text three that shares nothing with anybody else"),
    ]
    sf_dir = _write_docs(tmp_path, rows)
    got = {r["doc_id"]: r for r in dedup_exact_substring(spark, sf_dir).collect()}
    assert set(got) == {1, 2}, got
    for r in got.values():
        assert r["n_dup_windows"] >= 1
        assert 0 < r["dup_frac_micro"] <= 1_000_000


def test_semantic_cluster_pairs_verify_against_numpy(spark, sf_smoke):
    """Every (dropped, kept) row must satisfy kept_id < vec_id and a
    true cosine >= threshold, recomputed independently with numpy."""
    import numpy as np

    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.similarity import (
        SEM_COS_THRESHOLD,
        dedup_semantic_cluster,
    )

    rows = dedup_semantic_cluster(spark, sf_smoke).collect()
    assert rows, "expected at least one semantic duplicate at sf0.001"
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load(spark, sf_smoke, "embeddings").collect()
    }
    for r in rows:
        assert r["kept_id"] < r["vec_id"]
        a, b = vecs[r["kept_id"]], vecs[r["vec_id"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos >= SEM_COS_THRESHOLD - 1e-9
        assert math.isclose(cos, r["cos_sim"], abs_tol=5e-6)


def test_ann_recall_eval_bounds_and_floor(spark, sf_dir):
    """Per-query recall in [0,1], k == TOP_K, and the corpus-wide mean
    must clear the same floor the dedicated IVF recall test pins."""
    from parquet_batch_spark.operators.similarity import TOP_K, ann_recall_eval

    rows = ann_recall_eval(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["k"] == TOP_K
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_recalled"] <= r["k"]
    mean = sum(r["recall"] for r in rows) / len(rows)
    assert mean >= 0.55, f"mean IVF recall {mean:.2f} < 0.55"


def test_quality_model_separates_prose_from_symbol_soup(spark, tmp_path):
    """Clean prose must pass the linear model; symbol soup must fail.
    Cohorts are (lang, source) so plant each in its own source."""
    from parquet_batch_spark.operators.pipeline_ops import quality_model_score

    prose = (
        "the quiet library holds a careful record of the town and it "
        "is a place for patient reading in the long afternoon hours "
    ) * 3
    soup = "@@ ## $$ %% ^^ && ** (( )) [[ ]] {{ }} << >> ~~ ;; :: || " * 6
    sf_dir = _write_docs(
        tmp_path, [(0, prose, "en", "clean"), (1, soup, "en", "spam")]
    )
    got = {r["source"]: r for r in quality_model_score(spark, sf_dir).collect()}
    assert got["clean"]["n_pass"] == 1, got["clean"]
    assert got["spam"]["n_pass"] == 0, got["spam"]
    assert got["clean"]["mean_logit_micro"] > got["spam"]["mean_logit_micro"]


def test_epoch_plan_budget_and_flag_arithmetic(spark, sf_dir):
    """The plan's integer arithmetic must be self-consistent: targets
    sum to the budget (within per-source floor slack), milli-epochs is
    the exact floor ratio, and the flag fires iff the cap is crossed."""
    from parquet_batch_spark.operators.llm_prep import (
        EPOCH_BUDGET_X,
        EPOCH_MAX,
        sample_epoch_plan,
    )

    rows = sample_epoch_plan(spark, sf_dir).collect()
    corpus = sum(r["avail_tokens"] for r in rows)
    budget = EPOCH_BUDGET_X * corpus
    tgt = sum(r["target_tokens"] for r in rows)
    assert budget - len(rows) < tgt <= budget
    for r in rows:
        assert r["milli_epochs"] == (1000 * r["target_tokens"]) // r["avail_tokens"]
        assert r["over_repetition_cap"] == (r["milli_epochs"] > EPOCH_MAX * 1000)


def test_audio_energy_matches_numpy_reference(spark, sf_smoke):
    """Frame energies recomputed independently (python ints, no numpy
    cumsum) for a handful of docs must match exactly — pins the
    framing arithmetic (full windows + single short frame) and the
    first-max peak tie-break."""
    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.multimodal import (
        AUDIO_FRAME,
        AUDIO_HOP,
        multimodal_audio_energy,
    )

    rows = {r["doc_id"]: r for r in multimodal_audio_energy(spark, sf_smoke).collect()}
    docs = load(spark, sf_smoke, "documents").filter("doc_id < 5").collect()
    assert docs
    for d in docs:
        body = d["text"].encode("utf-8")
        n = len(body)
        n_frames = (n - AUDIO_FRAME) // AUDIO_HOP + 1 if n >= AUDIO_FRAME else 1
        es = [
            sum(b * b for b in body[f * AUDIO_HOP : min(f * AUDIO_HOP + AUDIO_FRAME, n)])
            for f in range(n_frames)
        ]
        r = rows[d["doc_id"]]
        assert r["n_samples"] == n
        assert r["n_frames"] == n_frames
        assert r["total_energy"] == sum(es)
        assert r["peak_energy"] == max(es)
        assert r["peak_frame"] == es.index(max(es))


def test_matryoshka_eval_agreement_is_honest(spark, sf_dir):
    """agree must be exactly (top1_full_id == top1_trunc_id), cosines
    in [-1, 1], and the full-dim top-1 must match the brute-force
    operator's rank-1 row for every query."""
    from parquet_batch_spark.operators.similarity import (
        ann_bruteforce_topk,
        embedding_matryoshka_eval,
    )

    mrl = {r["query_id"]: r for r in embedding_matryoshka_eval(spark, sf_dir).collect()}
    bf1 = {
        r["query_id"]: r
        for r in ann_bruteforce_topk(spark, sf_dir).collect()
        if r["rank"] == 1
    }
    assert set(mrl) == set(bf1)
    for q, r in mrl.items():
        assert r["agree"] == (r["top1_full_id"] == r["top1_trunc_id"])
        assert -1.0 <= r["cos_full"] <= 1.0 and -1.0 <= r["cos_trunc"] <= 1.0
        assert r["top1_full_id"] == bf1[q]["neighbor_id"]
        assert r["cos_full"] == bf1[q]["cos_sim"]


def test_video_frame_diff_matches_python_reference(spark, sf_smoke):
    """Transition motions recomputed with plain python ints for a few
    docs must match exactly — pins full-frame framing, the abs-delta
    sum, and the first-max peak."""
    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.multimodal import (
        VFD_FRAME,
        multimodal_video_frame_diff,
    )

    rows = {
        r["doc_id"]: r for r in multimodal_video_frame_diff(spark, sf_smoke).collect()
    }
    for d in load(spark, sf_smoke, "documents").filter("doc_id < 5").collect():
        body = d["text"].encode("utf-8")
        n_full = len(body) // VFD_FRAME
        frames = [
            body[f * VFD_FRAME : (f + 1) * VFD_FRAME] for f in range(n_full)
        ]
        deltas = [
            sum(abs(a - b) for a, b in zip(frames[f], frames[f + 1]))
            for f in range(n_full - 1)
        ]
        r = rows[d["doc_id"]]
        assert r["n_full_frames"] == n_full
        assert r["n_transitions"] == max(0, n_full - 1)
        if deltas:
            assert r["total_motion"] == sum(deltas)
            assert r["peak_motion"] == max(deltas)
            assert r["peak_transition"] == deltas.index(max(deltas))
        else:
            assert (r["total_motion"], r["peak_transition"]) == (0, -1)


def test_kcenter_greedy_matches_numpy_reference(spark, sf_smoke):
    """The full greedy trace (center ids AND radii) recomputed with
    numpy at smoke scale must match; radii must be non-increasing."""
    import numpy as np

    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.similarity import (
        KCENTER_K,
        sample_coreset_kcenter,
    )

    got = sample_coreset_kcenter(spark, sf_smoke).collect()
    assert len(got) == KCENTER_K
    emb = sorted(
        (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
        for r in load(spark, sf_smoke, "embeddings").collect()
    )
    ids = [i for i, _ in emb]
    V = np.stack([v for _, v in emb])
    centers = [0]  # position of min vec_id in the sorted list
    mind = ((V - V[0]) ** 2).sum(axis=1)
    trace = [(ids[0], None)]
    for _ in range(1, KCENTER_K):
        far = int(np.argmax(mind))  # first max == lowest id on ties
        trace.append((ids[far], float(mind[far])))
        centers.append(far)
        mind = np.minimum(mind, ((V - V[far]) ** 2).sum(axis=1))
    for r, (cid, rad) in zip(got, trace):
        assert r["center_id"] == cid
        if rad is None:
            assert r["radius2"] is None
        else:
            assert abs(r["radius2"] - rad) < 5e-6
    radii = [r["radius2"] for r in got[1:]]
    assert all(a >= b - 1e-12 for a, b in zip(radii, radii[1:])), radii


def test_pipe_syntax_still_pushes_filters(spark, sf_dir):
    """The |> pipeline form must compile to the same pushdown-friendly
    plan as classic SQL: the WHERE stage's date predicate reaches the
    parquet scan."""
    from parquet_batch_spark.operators.relational import sql_pipe_syntax
    from parquet_batch_spark.plans.inspect import pushed_filters

    df = sql_pipe_syntax(spark, sf_dir)
    assert any("o_orderdate" in f for f in pushed_filters(df))


def test_session_variable_folds_to_literal(spark, sf_dir):
    """The session variable must fold to a literal at plan time (no
    variable lookup at runtime): the optimized plan contains the
    threshold constant, and re-running after SET VAR with the same
    value is idempotent."""
    from parquet_batch_spark.operators.relational import (
        SESSION_VAR_THRESHOLD,
        sql_session_variables,
    )

    df = sql_session_variables(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert str(SESSION_VAR_THRESHOLD) in plan.replace(".0", ""), plan[:1500]
    assert df.collect() == sql_session_variables(spark, sf_dir).collect()


def test_bloom_screen_supersets_exact_overlap(spark, sf_dir):
    """The Bloom screen can false-positive but never false-negative:
    per train doc, bloom hits >= exact contaminated grams, and every
    doc the exact join flags must be flagged by the screen."""
    from parquet_batch_spark.operators.pipeline_ops import (
        decontam_bloom_filter,
        decontam_ngram_overlap,
    )

    bloom = {r["doc_id"]: r for r in decontam_bloom_filter(spark, sf_dir).collect()}
    exact = {r["doc_id"]: r for r in decontam_ngram_overlap(spark, sf_dir).collect()}
    assert set(bloom) == set(exact)
    assert any(r["contaminated"] for r in exact.values()), "vacuous corpus"
    for did, er in exact.items():
        assert bloom[did]["n_bloom_hits"] >= er["n_contaminated_grams"], did
        if er["contaminated"]:
            assert bloom[did]["flagged"], did


def test_cdc_chunking_realigns_after_insertion(spark, tmp_path):
    """The CDC property fixed-size blocks lack: after an insertion at
    the FRONT of a document, boundaries inside the unchanged suffix
    re-align (they depend only on window content), so the bulk of the
    shifted copy still dedups against the original."""
    from parquet_batch_spark.operators.dedup import dedup_cdc_chunking

    base = " ".join(f"token{i} payload{i % 7}" for i in range(40))
    rows = [
        (0, base),
        (1, "ZZZ inserted preamble shifts every offset. " + base),
        (2, "an unrelated short document that shares no chunks with the others"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = {r["doc_id"]: r for r in dedup_cdc_chunking(spark, sf).collect()}
    assert set(got) == {0, 1, 2}
    # realignment: most of the original's chars are found duplicated in
    # the shifted copy despite every absolute offset differing
    assert got[0]["dup_share"] >= 0.5, got[0]
    assert got[1]["dup_chars"] > 0, got[1]
    assert got[2]["n_dup_chunks"] == 0, got[2]
    for r in got.values():
        assert r["dup_chars"] <= r["n_chunks"] * 1_000
        assert 0.0 <= r["dup_share"] <= 1.0


def test_pq_cascade_beats_raw_adc_and_matches_bruteforce_floor(spark, sf_dir):
    """The ADC-shortlist -> exact-rerank cascade must (a) reach a
    recall@5 floor vs the exact baseline that raw ADC ranking alone
    cannot (measured: cascade ~0.5, raw ADC ~0.1 on these
    structure-free synthetic embeddings), and (b) return exact
    distances consistent with the ADC approximation ordering."""
    from collections import defaultdict

    from parquet_batch_spark.operators.similarity import (
        TOP_K,
        ann_bruteforce_topk,
        ann_pq_adc,
    )

    pq_rows = ann_pq_adc(spark, sf_dir).collect()
    P, B = defaultdict(set), defaultdict(set)
    for r in pq_rows:
        P[r["query_id"]].add(r["neighbor_id"])
        assert r["adc_d2"] >= 0.0 and r["d2"] >= 0.0
        assert 1 <= r["rank"] <= TOP_K
    for r in ann_bruteforce_topk(spark, sf_dir).collect():
        B[r["query_id"]].add(r["neighbor_id"])
    assert set(P) == set(B)
    recall = sum(len(P[q] & B[q]) / len(B[q]) for q in B) / len(B)
    assert recall >= 0.3, recall


def test_dsir_matches_pure_python_recompute(spark, sf_smoke):
    """Recompute every train doc's DSIR score with pure-python md5
    hashing and math.log — the integer micro-unit scores must match
    exactly, and the above-mean selection must be non-degenerate."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb

    from parquet_batch_spark.operators.llm_prep import (
        DSIR_B,
        DSIR_TARGET_MOD,
        text_dsir_importance,
    )

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    tb, rb, docs = [0] * DSIR_B, [0] * DSIR_B, {}
    for did, text in rows:
        bs = [h32(t) % DSIR_B for t in text.strip().split()]
        docs[did] = bs
        counts = tb if did % DSIR_TARGET_MOD == 0 else rb
        for b in bs:
            counts[b] += 1
    T, R = sum(tb), sum(rb)
    dm = [
        int(
            Decimal(
                1000000.0
                * (
                    math.log(tb[b] + 1)
                    - math.log(T + DSIR_B)
                    - math.log(rb[b] + 1)
                    + math.log(R + DSIR_B)
                )
            ).quantize(0, rounding=ROUND_HALF_UP)
        )
        for b in range(DSIR_B)
    ]
    got = {r["doc_id"]: r for r in text_dsir_importance(spark, sf_smoke).collect()}
    scores = {}
    for did, bs in docs.items():
        if did % DSIR_TARGET_MOD == 0:
            continue
        scores[did] = sum(dm[b] for b in bs)
        assert got[did]["n_tokens"] == len(bs)
        assert got[did]["dsir_micro"] == scores[did], did
    mean_num, n = sum(scores.values()), len(scores)
    for did, s in scores.items():
        assert got[did]["selected"] == (s * n > mean_num), did
    n_sel = sum(1 for r in got.values() if r["selected"])
    assert 0 < n_sel < len(got), n_sel


def test_sql_udf_inlines_into_plan(spark, sf_dir):
    """Spark 4 SQL UDFs must inline at analysis time — no function
    call survives into the optimized plan (that is the whole scale
    argument vs Python UDFs)."""
    from parquet_batch_spark.operators.relational import sql_udf_create_function

    df = sql_udf_create_function(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # no function-call node survives; the bodies appear as plain
    # Catalyst expressions (alias attribute names like qty_tier#N are
    # just names, not calls)
    assert "ScalaUDF" not in plan and "PythonUDF" not in plan, plan[:1200]
    assert "disc_rev(" not in plan and "qty_tier(" not in plan, plan[:1200]
    assert "CASE WHEN" in plan  # qty_tier body, inlined
    assert len(df.collect()) == 9  # 3 tiers x 3 return flags


def test_watermark_separates_natural_from_planted(spark, tmp_path):
    """Natural text sits at the gamma=0.25 green rate and never trips
    z>=4; a doc GENERATED to stay on the green list flags
    immediately."""
    import hashlib

    from parquet_batch_spark.operators.text_analysis import (
        WM_GAMMA_DEN,
        text_watermark_greenlist,
    )

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    vocab = [f"w{i}" for i in range(50)]
    toks = ["w0"]
    for _ in range(40):  # greedy soft-watermark generator
        toks.append(
            next(t for t in vocab if h32(f"{toks[-1]} {t}") % WM_GAMMA_DEN == 0)
        )
    natural = "the quick brown fox jumps over the lazy dog again and again today"
    sf = _write_docs(tmp_path, [(0, " ".join(toks)), (1, natural)])
    got = {r["doc_id"]: r for r in text_watermark_greenlist(spark, sf).collect()}
    assert got[0]["green_frac"] == 1.0
    assert got[0]["flagged"] and got[0]["z_micro"] >= 4_000_000
    assert not got[1]["flagged"]


def test_watermark_natural_corpus_rate(spark, sf_dir):
    """Corpus-level sanity: the mean green fraction of natural text
    tracks gamma and essentially nothing flags."""
    from parquet_batch_spark.operators.text_analysis import text_watermark_greenlist

    rows = text_watermark_greenlist(spark, sf_dir).collect()
    mean_frac = sum(r["green_frac"] for r in rows) / len(rows)
    assert abs(mean_frac - 0.25) < 0.03, mean_frac
    assert sum(r["flagged"] for r in rows) <= len(rows) * 0.01


def test_ivfpq_recall_floor_and_candidate_containment(spark, sf_dir):
    """The composed IVF+PQ cascade must hold a recall@5 floor vs the
    exact baseline (measured ~0.58 at sf0.01 while probing only
    nprobe/K of the corpus), and every returned neighbor must come
    from a probed IVF cell (containment in the candidate-generation
    contract)."""
    from collections import defaultdict

    from parquet_batch_spark.operators.similarity import (
        TOP_K,
        ann_bruteforce_topk,
        ann_ivfpq_topk,
    )

    rows = ann_ivfpq_topk(spark, sf_dir).collect()
    P, B = defaultdict(set), defaultdict(set)
    for r in rows:
        P[r["query_id"]].add(r["neighbor_id"])
        assert r["adc_d2"] >= 0.0 and r["d2"] >= 0.0
        assert 1 <= r["rank"] <= TOP_K
    for r in ann_bruteforce_topk(spark, sf_dir).collect():
        B[r["query_id"]].add(r["neighbor_id"])
    assert set(P) == set(B)
    recall = sum(len(P[q] & B[q]) / len(B[q]) for q in B) / len(B)
    assert recall >= 0.3, recall


def test_perplexity_buckets_are_balanced_and_ordered(spark, sf_dir):
    """Per language: tertile sizes differ by at most one (NTILE
    contract) and the head/middle/tail score ranges are
    non-overlapping and ordered."""
    from collections import defaultdict

    from parquet_batch_spark.operators.text_analysis import (
        quality_perplexity_buckets,
    )

    by_lang = defaultdict(dict)
    for r in quality_perplexity_buckets(spark, sf_dir).collect():
        by_lang[r["lang"]][r["bucket"]] = r
    for lang, bks in by_lang.items():
        assert set(bks) == {"head", "middle", "tail"}, (lang, bks)
        sizes = [bks[b]["n_docs"] for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        assert bks["head"]["max_score_milli"] <= bks["middle"]["min_score_milli"]
        assert bks["middle"]["max_score_milli"] <= bks["tail"]["min_score_milli"]
        for b in bks.values():
            assert b["min_score_milli"] <= b["max_score_milli"]


def test_weighted_sample_matches_python_topk(spark, sf_smoke):
    """Recompute every A-ES key in pure python (md5 -> dyadic u ->
    ln(u)/w) and check the operator returns exactly the python top-K
    in order."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb

    from parquet_batch_spark.operators.llm_prep import (
        WSAMPLE_K,
        sample_weighted_without_replacement,
    )

    rows = duckdb.connect().execute(
        f"SELECT doc_id, n_chars FROM read_parquet('{sf_smoke}/documents.parquet') "
        "WHERE n_chars > 0"
    ).fetchall()
    keys = []
    for did, w in rows:
        h = int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16)
        key = 1e9 * math.log((h + 1) / 4294967296.0) / float(w)
        keys.append((int(Decimal(key).quantize(0, rounding=ROUND_HALF_UP)), did, w))
    expect = sorted(keys, key=lambda t: (-t[0], t[1]))[:WSAMPLE_K]
    got = sample_weighted_without_replacement(spark, sf_smoke).collect()
    assert [(r["key_nano"], r["doc_id"], r["weight"]) for r in got] == expect


def test_adamic_adar_bounds_and_edge_containment(spark, sf_smoke):
    """Every scored pair must be an edge of the segment graph, and the
    integer score must sit inside [n_shared*term(min_df_cap),
    n_shared*term(2)] — the per-term quantization bounds."""
    import math

    from parquet_batch_spark.operators.corpus_ops import AA_SCALE, graph_adamic_adar
    from parquet_batch_spark.operators.llm_prep import DEGREE_HOT_CAP, segment_edges

    rows = graph_adamic_adar(spark, sf_smoke).collect()
    assert rows, "expected shared-segment pairs at sf0.001"
    edges = {(r["a"], r["b"]) for r in segment_edges(spark, sf_smoke).collect()}
    t_max = round(AA_SCALE / math.log(2))
    t_min = round(AA_SCALE / math.log(DEGREE_HOT_CAP))
    for r in rows:
        assert (r["a"], r["b"]) in edges
        assert r["a"] < r["b"]
        assert r["n_shared"] >= 1
        assert t_min * r["n_shared"] <= r["aa_micro"] <= t_max * r["n_shared"], r


def test_kneser_ney_matches_python_recompute(spark, sf_smoke):
    """Full pure-python KN recompute at sf0.001: pair/head/type counts,
    interpolated probability, micro-quantized log terms, per-doc sums
    must match exactly; probabilities must be proper (sum over
    observed continuations < 1 leaves mass for unseen)."""
    import hashlib  # noqa: F401  (parallel structure with sibling tests)
    import math
    from collections import Counter, defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb

    from parquet_batch_spark.operators.text_analysis import (
        KN_D,
        text_kneser_ney_score,
    )

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    c2, docs = Counter(), {}
    for did, text in rows:
        tk = text.strip().split()
        prs = list(zip(tk, tk[1:]))
        docs[did] = prs
        c2.update(prs)
    c1, nf, nb = Counter(), Counter(), Counter()
    for (w1, w2), c in c2.items():
        c1[w1] += c
        nf[w1] += 1
        nb[w2] += 1
    ntot = len(c2)
    term = {}
    bysum = defaultdict(float)
    for (w1, w2), c in c2.items():
        p = (c - KN_D) / c1[w1] + (KN_D * nf[w1] / c1[w1]) * (nb[w2] / ntot)
        bysum[w1] += p
        term[(w1, w2)] = int(
            Decimal(1000000.0 * math.log(p)).quantize(0, rounding=ROUND_HALF_UP)
        )
    assert all(s < 1.0 + 1e-9 for s in bysum.values())
    got = {r["doc_id"]: r for r in text_kneser_ney_score(spark, sf_smoke).collect()}
    for did, prs in docs.items():
        if not prs:
            continue
        assert got[did]["n_pairs"] == len(prs)
        assert got[did]["kn_logprob_micro"] == sum(term[p] for p in prs), did


def test_ltob_selects_max_area_point_per_bucket(spark, sf_smoke):
    """Python recompute of the whole LTOB pass at sf0.001: bucket
    stats, neighbor anchors, integer cross-product areas — the
    selected (x, y) per bucket must match exactly."""
    import duckdb

    from parquet_batch_spark.operators.analytics import (
        LTOB_BUCKET_US,
        rollup_downsample_ltob,
    )

    ev = duckdb.connect().execute(
        f"SELECT epoch_us(ts), CAST(ROUND(value*100) AS BIGINT), event_id "
        f"FROM read_parquet('{sf_smoke}/events.parquet')"
    ).fetchall()
    from collections import defaultdict

    buckets = defaultdict(list)
    for x, y, eid in ev:
        buckets[x // LTOB_BUCKET_US].append((x, y, eid))
    anchors = {}
    for b, pts in buckets.items():
        anchors[b] = (
            b * LTOB_BUCKET_US + LTOB_BUCKET_US // 2,
            sum(p[1] for p in pts) // len(pts),
        )
    order = sorted(buckets)
    prev_b = {b: order[i - 1] if i > 0 else None for i, b in enumerate(order)}
    next_b = {
        b: order[i + 1] if i < len(order) - 1 else None for i, b in enumerate(order)
    }
    expect = {}
    for b, pts in sorted(buckets.items()):
        # neighbors are the adjacent PRESENT buckets (lag/lead over the
        # bucket row sequence) — sparse hours don't break the chain
        if prev_b[b] is not None and next_b[b] is not None:
            (px, py), (nx, ny) = anchors[prev_b[b]], anchors[next_b[b]]
            best = max(
                pts,
                key=lambda p: (abs((px - p[0]) * (ny - p[1]) - (nx - p[0]) * (py - p[1])), -p[0], -p[2]),
            )
            expect[b] = (best[0], best[1])
        else:
            first_x = min(p[0] for p in pts)
            cands = [p for p in pts if p[0] == first_x]
            expect[b] = min((p[0], p[1]) for p in cands)
    got = {r["b"]: (r["x"], r["y"]) for r in rollup_downsample_ltob(spark, sf_smoke).collect()}
    assert got == expect


def test_webdataset_offsets_chain_exactly(spark, sf_dir):
    """Per shard: offsets start at 0, every member is 512-aligned, and
    each offset equals the previous offset + previous member size."""
    from collections import defaultdict

    from parquet_batch_spark.operators.multimodal import (
        TAR_BLOCK,
        multimodal_webdataset_index,
    )

    by_shard = defaultdict(list)
    for r in multimodal_webdataset_index(spark, sf_dir).collect():
        by_shard[r["shard"]].append(r)
    assert len(by_shard) > 1
    for shard, rows in by_shard.items():
        assert rows[0]["offset"] == 0
        for prev, cur in zip(rows, rows[1:]):
            assert cur["offset"] == prev["offset"] + prev["member_bytes"]
        for r in rows:
            assert r["member_bytes"] % TAR_BLOCK == 0
            assert r["data_offset"] == r["offset"] + TAR_BLOCK
            assert r["member_bytes"] >= TAR_BLOCK + r["payload_bytes"]
