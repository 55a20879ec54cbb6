"""Operator-surface tests over the driver-provided sf0.001 tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def docs_pd():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


@pytest.fixture(scope="module")
def emb_ds():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_pd():
    return pq.read_table(f"{SF}/embeddings.parquet").to_pandas()


# ------------------------------------------------------------------- dedup
# The driver's documents table has no exact duplicates; the fixture corpus
# (gen_pages, dup_fraction=0.02) provides a duplicate-bearing corpus.


@pytest.fixture(scope="module")
def dup_pd():
    from solr_ray.fixtures import gen_pages

    pages = gen_pages(300, seed=42).to_pandas()
    return pd.DataFrame({"doc_id": range(len(pages)), "text": pages["text"]})


@pytest.fixture(scope="module")
def dup_ds(dup_pd):
    return ray.data.from_pandas(dup_pd)


def test_exact_dedup(dup_ds, dup_pd):
    from solr_ray.ops.dedup import exact_dedup

    out = exact_dedup(dup_ds, ["text"], order_col="doc_id").to_pandas()
    expect = dup_pd.loc[dup_pd.groupby("text")["doc_id"].idxmin()]
    assert sorted(out["doc_id"]) == sorted(expect["doc_id"])
    assert len(out) < len(dup_pd)  # corpus contains duplicates


def test_text_profile_signature_clusters_near_dups():
    from solr_ray.ops.dedup import text_profile_signature

    a = "the quick brown fox " * 50
    b = a + "jumped"  # small change, low-freq word dropped by quantization
    c = "completely different content here " * 50
    assert text_profile_signature(a) == text_profile_signature(b)
    assert text_profile_signature(a) != text_profile_signature(c)


def test_minhash_lsh_finds_exact_dups(dup_ds, dup_pd):
    from solr_ray.ops.dedup import (
        connected_components,
        jaccard_verify_pairs,
        minhash_lsh_candidates,
    )

    cand = minhash_lsh_candidates(dup_ds, "doc_id", "text", num_perm=32, bands=8)
    verified = jaccard_verify_pairs(cand, dup_ds, "doc_id", "text",
                                    threshold=0.9).to_pandas()
    # every exact-duplicate pair must be found
    dup_groups = dup_pd.groupby("text")["doc_id"].apply(list)
    expected_pairs = set()
    for ids in dup_groups:
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                expected_pairs.add((ids[i], ids[j]))
    got_pairs = set(zip(verified["id_a"], verified["id_b"]))
    assert expected_pairs <= got_pairs
    clusters = connected_components(verified)
    for ids in dup_groups:
        if len(ids) > 1:
            reps = {clusters[i] for i in ids}
            assert len(reps) == 1


def test_jaccard_join_path_matches_broadcast(dup_ds, dup_pd):
    """The zero-driver-state join path (duplicate-heavy-corpus scale path)
    must produce bit-identical verified pairs to the broadcast path."""
    from solr_ray.ops.dedup import jaccard_verify_pairs, minhash_lsh_candidates

    cand = minhash_lsh_candidates(
        dup_ds, "doc_id", "text", num_perm=32, bands=8).materialize()
    vb = jaccard_verify_pairs(cand, dup_ds, "doc_id", "text",
                              threshold=0.9).to_pandas()
    vj = jaccard_verify_pairs(cand, dup_ds, "doc_id", "text", threshold=0.9,
                              method="join").to_pandas()
    sb = vb.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    sj = vj.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert sb.equals(sj)


def test_connected_components_distributed_matches_unionfind(ray_session):
    """Min-label propagation == driver union-find on a worst-case graph:
    a long chain (diameter >> 1 exercises multi-round convergence) plus a
    clique, string vertex ids."""
    import ray.data

    from solr_ray.ops.dedup import (
        connected_components,
        connected_components_distributed,
    )

    rows = {"id_a": [], "id_b": []}
    for i in range(30):
        rows["id_a"].append(f"d{i:03d}")
        rows["id_b"].append(f"d{i + 1:03d}")
    for i in range(40, 50):
        for j in range(i + 1, 50):
            rows["id_a"].append(f"d{i:03d}")
            rows["id_b"].append(f"d{j:03d}")
    pairs = pd.DataFrame(rows)
    local = connected_components(pairs)
    dist = connected_components_distributed(
        ray.data.from_pandas(pairs)).to_pandas()
    assert dict(zip(dist["id"], dist["cluster"])) == local


def test_simhash_candidates(dup_ds, dup_pd):
    from solr_ray.ops.dedup import simhash_candidates, simhash64

    t = dup_pd["text"].iloc[0]
    assert simhash64(t) == simhash64(t)
    out = simhash_candidates(dup_ds, "doc_id", "text", max_hamming=0).to_pandas()
    dup_groups = dup_pd.groupby("text")["doc_id"].apply(list)
    some_dup = next(sorted(ids) for ids in dup_groups if len(ids) > 1)
    assert ((out["id_a"] == some_dup[0]) & (out["id_b"] == some_dup[1])).any()


# -------------------------------------------------------------- similarity

def test_knn_brute_matches_numpy(emb_ds, emb_pd):
    from solr_ray.ops.similarity import knn_brute

    m = np.array(emb_pd["embedding"].tolist(), dtype=np.float32)
    q = m[:3]
    out = knn_brute(emb_ds, q, k=5).to_pandas()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = mn @ qn.T
    for qi in range(3):
        order = np.lexsort((emb_pd["vec_id"].to_numpy(), -sims[:, qi]))[:5]
        expect = emb_pd["vec_id"].to_numpy()[order].tolist()
        got = out[out.query_id == qi].sort_values("rank")["id"].tolist()
        assert got == expect
        # the query vector itself must be its own top hit
        assert got[0] == emb_pd["vec_id"].iloc[qi]


def test_knn_lsh_recall(emb_ds, emb_pd):
    from solr_ray.ops.similarity import knn_brute, knn_lsh

    m = np.array(emb_pd["embedding"].tolist(), dtype=np.float32)
    q = m[:5]
    exact = knn_brute(emb_ds, q, k=5).to_pandas()
    approx = knn_lsh(emb_ds, q, k=5, n_bits=6, probe_radius=2).to_pandas()
    recalls = []
    for qi in range(5):
        e = set(exact[exact.query_id == qi]["id"])
        a = set(approx[approx.query_id == qi]["id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # radius-2 multiprobe, 6-bit buckets
    # the query vector itself always shares its own bucket -> rank-1 hit
    for qi in range(5):
        assert approx[(approx.query_id == qi) & (approx["rank"] == 1)]["score"].iloc[0] == pytest.approx(1.0)


def test_pairwise_cosine_topk(emb_ds, emb_pd):
    from solr_ray.ops.similarity import pairwise_cosine_topk

    # this table's max off-diagonal cosine is ~0.48; use a reachable threshold
    out = pairwise_cosine_topk(emb_ds, threshold=0.4).to_pandas()
    assert len(out) > 0
    assert (out["id_a"] < out["id_b"]).all()
    assert (out["cosine"] >= 0.4).all()
    m = np.array(emb_pd["embedding"].tolist(), dtype=np.float32)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    np.fill_diagonal(sims, -1)
    ids = emb_pd["vec_id"].to_numpy()
    expect = {(int(ids[i]), int(ids[j]))
              for i, j in zip(*np.where(sims >= 0.4)) if ids[i] < ids[j]}
    assert set(zip(out["id_a"], out["id_b"])) == expect


def test_pairwise_cosine_topk_per_id_cut(emb_ds, emb_pd):
    from solr_ray.ops.similarity import pairwise_cosine_topk

    full = pairwise_cosine_topk(emb_ds, threshold=0.3).to_pandas()
    cut = pairwise_cosine_topk(emb_ds, k=2, threshold=0.3).to_pandas()
    assert (cut.groupby("id_a").size() <= 2).all()
    # kept pairs are each id_a's highest-cosine partners
    for ida, g in cut.groupby("id_a"):
        best = (full[full.id_a == ida]
                .sort_values(["cosine", "id_b"], ascending=[False, True])
                .head(2))
        assert sorted(g["id_b"]) == sorted(best["id_b"])


def test_pairwise_cosine_lsh_recovers_planted_dups(emb_pd):
    from solr_ray.ops.similarity import pairwise_cosine_topk

    # plant near-duplicate vectors: ids 9000+i ~ copy of row i + tiny noise
    rng = np.random.default_rng(3)
    m = np.array(emb_pd["embedding"].tolist(), dtype=np.float32)
    planted = m[:10] + rng.normal(0, 1e-3, (10, m.shape[1])).astype(np.float32)
    pdf = pd.concat([
        pd.DataFrame({"vec_id": emb_pd["vec_id"],
                      "embedding": list(map(list, m))}),
        pd.DataFrame({"vec_id": np.arange(9000, 9010),
                      "embedding": list(map(list, planted))}),
    ], ignore_index=True)
    ds = ray.data.from_pandas(pdf).repartition(4)
    out = pairwise_cosine_topk(ds, threshold=0.99, method="lsh",
                               n_bits=6, bands=8).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    ids = emb_pd["vec_id"].to_numpy()
    want = {(int(ids[i]), 9000 + i) for i in range(10)}
    assert want <= got  # every planted near-dup pair collides in >=1 band
    assert (out["cosine"] >= 0.99).all()
    assert len(got) == len(out)  # band-deduped


def test_knn_lsh_index_prunes_io(emb_ds, emb_pd, tmp_path):
    from solr_ray.ops.similarity import build_lsh_index, knn_lsh, knn_lsh_index

    idx = str(tmp_path / "lshidx")
    build_lsh_index(emb_ds, idx, n_bits=6)
    m = np.array(emb_pd["embedding"].tolist(), dtype=np.float32)
    q = m[:5]
    stats = {}
    got = knn_lsh_index(idx, q, k=5, probe_radius=2,
                        stats_out=stats).to_pandas()
    # I/O pruning: probed partitions are a strict subset of the layout
    assert 0 < stats["files_probed"] < stats["files_total"]
    # identical results to the in-stream variant (same planes/probing)
    ref = knn_lsh(emb_ds, q, k=5, n_bits=6, probe_radius=2).to_pandas()
    key = ["query_id", "rank"]
    got = got.sort_values(key).reset_index(drop=True)
    ref = ref.sort_values(key).reset_index(drop=True)
    assert got["id"].tolist() == ref["id"].tolist()
    assert np.allclose(got["score"], ref["score"])


# --------------------------------------------------------------- textstats

def test_language_id():
    from solr_ray.ops.textstats import detect_language

    assert detect_language("the cat sat on the mat and it was good")[0] == "en"
    assert detect_language("der hund ist nicht mit der katze und das haus")[0] == "de"
    assert detect_language("le chat est dans la maison et il est pour les")[0] == "fr"
    assert detect_language("")[0] == "und"


def test_langid_stage(docs_ds):
    from solr_ray.ops.textstats import LangIdStage

    out = docs_ds.map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=2
    ).to_pandas()
    assert {"lang_pred", "lang_pred_conf"} <= set(out.columns)
    assert len(out) == docs_ds.count()


def test_quality_and_token_count(docs_ds, docs_pd):
    from solr_ray.ops.textstats import add_token_count, quality_features

    out = docs_ds.map_batches(
        lambda t: add_token_count(quality_features(t), "text"),
        batch_format="pyarrow",
    ).to_pandas().sort_values("doc_id")
    expect = docs_pd.sort_values("doc_id")["text"].str.split().str.len()
    assert out["n_tokens"].tolist() == expect.tolist()
    assert ((out["quality_score"] >= 0) & (out["quality_score"] <= 1)).all()


def test_fingerprint_deterministic(docs_pd):
    from solr_ray.ops.textstats import rolling_fingerprint

    t = docs_pd["text"].iloc[0]
    u = docs_pd["text"].iloc[1]
    assert rolling_fingerprint(t) == rolling_fingerprint(t)
    assert rolling_fingerprint(t) != rolling_fingerprint(u)
    # extending a doc keeps its min-window fingerprint (containment property)
    assert rolling_fingerprint(t) == rolling_fingerprint(t + " zzz qqq xxx yyy")


def test_salted_term_counts_match_unsalted(docs_ds, docs_pd):
    from solr_ray.ops.textstats import salted_term_counts

    out = salted_term_counts(docs_ds, "text", num_salts=8).to_pandas()
    # independent truth: pandas count over simple-analyzed tokens
    import re

    counts = {}
    for t in docs_pd["text"]:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            counts[w] = counts.get(w, 0) + 1
    got = dict(zip(out["term"], out["cnt"]))
    assert got == counts


def test_term_doc_freq(docs_ds, docs_pd):
    from solr_ray.ops.textstats import term_doc_freq

    out = term_doc_freq(docs_ds, "text").to_pandas()
    import re

    df = {}
    for t in docs_pd["text"]:
        for w in set(re.findall(r"[a-z0-9]+", t.lower())):
            df[w] = df.get(w, 0) + 1
    got = dict(zip(out["term"], out["df"]))
    assert got == df


# ---------------------------------------------------------------- grouping

def test_distinct_and_collapse(docs_ds, docs_pd):
    from solr_ray.ops.grouping import collapse, distinct

    langs = distinct(docs_ds.select_columns(["lang"]), ["lang"]).to_pandas()
    assert sorted(langs["lang"]) == sorted(docs_pd["lang"].unique())

    top = collapse(docs_ds, "lang", "n_chars", descending=True).to_pandas()
    expect = docs_pd.loc[docs_pd.groupby("lang")["n_chars"].idxmax()]
    got = dict(zip(top["lang"], top["n_chars"]))
    for lang, nc in zip(expect["lang"], expect["n_chars"]):
        assert got[lang] == nc


def test_group_topk(docs_ds, docs_pd):
    from solr_ray.ops.grouping import group_topk

    out = group_topk(docs_ds, "lang", "n_chars", k=2).to_pandas()
    for lang, g in docs_pd.groupby("lang"):
        expect = set(g.nlargest(2, "n_chars")["n_chars"])
        got = set(out[out.lang == lang]["n_chars"])
        assert got == expect


def test_facets(docs_ds, docs_pd):
    from solr_ray.ops.grouping import facet_field, facet_range

    ff = facet_field(docs_ds, "lang", limit=10).to_pandas()
    vc = docs_pd["lang"].value_counts()
    assert dict(zip(ff.iloc[:, 0], ff["count"] if "count" in ff else ff.iloc[:, 1])) == vc.to_dict()

    fr = facet_range(docs_ds, "n_chars", 0, 1000, 100).to_pandas()
    in_range = docs_pd[(docs_pd.n_chars >= 0) & (docs_pd.n_chars < 1000)]
    buckets = ((in_range["n_chars"] // 100) * 100).value_counts().sort_index()
    assert fr.iloc[:, 0].tolist() == buckets.index.tolist()


def test_significant_terms(docs_ds):
    from solr_ray.ops.grouping import significant_terms

    fg = docs_ds.filter(lambda r: r["lang"] == "en")
    out = significant_terms(fg, docs_ds, "text", min_doc_freq=2,
                            limit=5).to_pandas()
    assert len(out) == 5
    assert (out["score"] > 0).all()


# ------------------------------------------------------------------- joins

def test_broadcast_and_shuffle_join():
    from solr_ray.ops.joins import broadcast_hash_join, shuffle_join

    orders = ray.data.read_parquet(f"{SF}/orders.parquet")
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    b = broadcast_hash_join(
        orders, cust.rename(columns={"c_custkey": "o_custkey"}), "o_custkey"
    ).to_pandas()
    opd = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    expect = opd.merge(cust, left_on="o_custkey", right_on="c_custkey")
    assert len(b) == len(expect)

    cust_ds = ray.data.read_parquet(f"{SF}/customer.parquet").map_batches(
        lambda t: t.rename_columns(
            ["o_custkey" if c == "c_custkey" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    s = shuffle_join(orders, cust_ds, "o_custkey", num_partitions=4).to_pandas()
    assert len(s) == len(expect)


def test_semi_anti_join(docs_ds, docs_pd):
    from solr_ray.ops.joins import anti_join, semi_join

    keys = [0, 1, 2, 3, 4]
    s = semi_join(docs_ds, keys, "doc_id").to_pandas()
    assert sorted(s["doc_id"]) == keys
    a = anti_join(docs_ds, keys, "doc_id").to_pandas()
    assert len(a) == len(docs_pd) - 5


def test_explode():
    from solr_ray.ops.joins import explode

    ds = ray.data.from_items(
        [{"k": 1, "vals": ["a", "b"]}, {"k": 2, "vals": ["c"]}, {"k": 3, "vals": []}]
    )
    out = explode(ds, "vals").to_pandas().sort_values("vals")
    assert out["vals"].tolist() == ["a", "b", "c"]
    assert out["k"].tolist() == [1, 1, 2]


def test_fetch_fields(docs_ds, docs_pd):
    from solr_ray.ops.joins import fetch_fields

    lookup = pd.DataFrame({"doc_id": [0, 1], "extra": ["x", "y"]})
    out = fetch_fields(docs_ds, lookup, "doc_id", ["extra"]).to_pandas()
    assert len(out) == len(docs_pd)
    assert out.set_index("doc_id").loc[0, "extra"] == "x"
    assert out["extra"].isna().sum() == len(docs_pd) - 2


# -------------------------------------------------------------- aggregates

def test_hll_approx_distinct(docs_ds, docs_pd):
    from solr_ray.functions.aggregates import approx_distinct

    est = approx_distinct(docs_ds, "text", p=12)
    true = docs_pd["text"].nunique()
    assert abs(est - true) / true < 0.05


def test_exact_quantiles():
    from solr_ray.functions.aggregates import exact_quantiles

    li = ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=["l_quantity"])
    lpd = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_quantity"]).to_pandas()
    out = exact_quantiles(li, "l_quantity", [0.5, 0.9])
    for q in (0.5, 0.9):
        expect = lpd["l_quantity"].quantile(q, interpolation="lower")
        assert out[q] == expect


def test_stats_summary(docs_ds, docs_pd):
    from solr_ray.functions.aggregates import stats_summary

    s = stats_summary(docs_ds, "n_chars")
    assert s["count"] == len(docs_pd)
    assert s["mean"] == pytest.approx(docs_pd["n_chars"].mean())
    assert s["stddev"] == pytest.approx(docs_pd["n_chars"].std(ddof=0), rel=1e-9)


# --------------------------------------------------------- scalar functions

def test_apply_expr():
    from solr_ray.functions.scalar import apply_expr

    t = pa.table({"a": [1.0, 4.0, 9.0], "s": ["x", "y", "z"]})
    t = apply_expr(t, "r", "sqrt", "a")
    assert t["r"].to_pylist() == [1.0, 2.0, 3.0]
    t = apply_expr(t, "c", "concat", "s", "s")
    assert t["c"].to_pylist() == ["xx", "yy", "zz"]
    t = apply_expr(t, "m", "max", "a", "r")
    assert t["m"].to_pylist() == [1.0, 4.0, 9.0]
    t = apply_expr(t, "cond", "if", apply_expr(t, "_g", "gt", "a", 2.0)["_g"], "a", "r")
    assert t["cond"].to_pylist() == [1.0, 4.0, 9.0]


def test_vector_functions():
    from solr_ray.functions.scalar import apply_expr

    t = pa.table({
        "u": [[1.0, 0.0], [0.0, 2.0]],
        "v": [[1.0, 0.0], [1.0, 0.0]],
    })
    t = apply_expr(t, "dot", "dotProduct", "u", "v")
    assert t["dot"].to_pylist() == [1.0, 0.0]
    t = apply_expr(t, "cos", "cosineSimilarity", "u", "v")
    assert t["cos"].to_pylist() == [1.0, 0.0]


# ----------------------------------------------------------------- windows

def test_timeseries():
    from solr_ray.ops.windows import timeseries

    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    out = timeseries(ev, "ts", "day", {"n": ("value", "count"),
                                       "total": ("value", "sum")}).to_pandas()
    epd = pq.read_table(f"{SF}/events.parquet").to_pandas()
    expect = epd.groupby(epd["ts"].dt.floor("D"))["value"].agg(["count", "sum"])
    assert len(out) == len(expect)
    assert out["total"].sum() == pytest.approx(epd["value"].sum())


def test_tumbling_and_session_windows():
    from solr_ray.ops.windows import session_windows, tumbling_window

    ev = ray.data.read_parquet(f"{SF}/events.parquet").limit(2000)
    tw = tumbling_window(ev, "user_id", "ts", 86_400_000_000, "value").to_pandas()
    assert len(tw) > 0
    sw = session_windows(ev, "user_id", "ts", 3_600_000_000).to_pandas()
    assert (sw["session_end"] >= sw["session_start"]).all()


def _synth_log(n, span_us, n_keys, seed=7):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, span_us, n))
    return pd.DataFrame({
        "user_id": rng.integers(0, n_keys, n),
        "ts": pd.to_datetime(ts, unit="us"),
        "v": rng.integers(-50, 50, n),
        "eid": np.arange(n),
    })


def test_session_windows_sliced_exact_and_bounded():
    """Composite (key-bucket, time-slice) sessionization: boundary
    stitching is EXACT vs a brute-force pandas run, and the per-group
    peak row count stays bounded as the log grows in time (the shuffle
    key gains slices instead of growing groups)."""
    from solr_ray.ops.windows import session_windows

    GAP = 3_600_000_000
    SLICE = 2 * 86_400_000_000
    day_us = 86_400_000_000
    peaks = []
    for mult in (1, 4):
        df = _synth_log(4000 * mult, 10 * day_us * mult, 23)
        ds = ray.data.from_pandas(df).repartition(8)
        got = session_windows(ds, "user_id", "ts", GAP, num_buckets=4,
                              slice_us=SLICE).to_pandas()
        got = got.sort_values(["user_id", "session_start"]
                              ).reset_index(drop=True)
        rows = []
        for k, g in df.sort_values(["user_id", "ts"]).groupby("user_id"):
            t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            new = np.ones(len(t), bool)
            new[1:] = (t[1:] - t[:-1]) > GAP
            sid = np.cumsum(new) - 1
            for s in np.unique(sid):
                m = t[sid == s]
                rows.append((k, m.min(), m.max(), len(m)))
        want = pd.DataFrame(
            rows, columns=["user_id", "mn", "mx", "n"]).sort_values(
            ["user_id", "mn"]).reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["session_start"].astype("datetime64[us]")
                .astype("int64").to_numpy() == want["mn"].to_numpy()).all()
        assert (got["session_end"].astype("datetime64[us]")
                .astype("int64").to_numpy() == want["mx"].to_numpy()).all()
        assert (got["n_events"].to_numpy() == want["n"].to_numpy()).all()
        # partitioning math: peak (bucket, slice) group size
        sl = (df["ts"].astype("datetime64[us]").astype("int64") // SLICE)
        b = df["user_id"].to_numpy().astype(np.uint64) % 4
        peaks.append(int(pd.DataFrame({"b": b, "s": sl})
                         .groupby(["b", "s"]).size().max()))
    # 4x the events over 4x the time span: peak group stays ~flat
    assert peaks[1] < peaks[0] * 2, peaks


def test_sliding_window_sliced_exact():
    """Head/tail fix-up across time slices reproduces the unsliced rolling
    sum bit-exactly (integer values)."""
    from solr_ray.ops.windows import sliding_window

    day_us = 86_400_000_000
    df = _synth_log(6000, 12 * day_us, 17, seed=11)
    ds = ray.data.from_pandas(df).repartition(8)
    got = sliding_window(ds, "user_id", "ts", "v", n=5, agg="sum",
                         tie_col="eid", num_buckets=4,
                         slice_us=2 * day_us).to_pandas()
    got = got.sort_values("eid").reset_index(drop=True)
    w = df.sort_values(["user_id", "ts", "eid"]).copy()
    w["roll"] = (w.groupby("user_id")["v"]
                 .rolling(5, min_periods=1).sum()
                 .reset_index(level=0, drop=True))
    w = w.sort_values("eid").reset_index(drop=True)
    assert len(got) == len(w)
    assert (got["rolling_v"].to_numpy() == w["roll"].to_numpy()).all()


def test_topic_checkpoint(tmp_path):
    from solr_ray.ops.windows import TopicCheckpoint

    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    epd = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ck = TopicCheckpoint(str(tmp_path / "ck.json"))
    first = ck.pull(ev, "ts").to_pandas()
    assert len(first) == len(epd)
    mid = int(epd["ts"].astype("int64").quantile(0.5))
    ck.commit(mid)
    second = ck.pull(ev, "ts").to_pandas()
    assert len(second) == (epd["ts"].astype("int64") > mid).sum()


# -------------------------------------------------------------- multimodal

def test_multimodal_plumbing():
    from solr_ray.ops.multimodal import (
        FrameSampleStage,
        ImageFeatureStage,
        ImageResizeStage,
        media_features,
    )

    rows = [
        {"media_id": i, "kind": "image", "payload": bytes([i]) * 100,
         "mime": "image/png", "width": 640, "height": 480, "duration_ms": 3500}
        for i in range(10)
    ]
    ds = ray.data.from_items(rows)
    out = media_features(ds, ImageFeatureStage, concurrency=2, batch_size=4,
                         dim=16).to_pandas()
    assert out["decode_ok"].all()
    assert len(out["feature"].iloc[0]) == 16
    # determinism: same payload -> same feature
    again = media_features(ds, ImageFeatureStage, concurrency=2, batch_size=4,
                           dim=16).to_pandas()
    assert out.sort_values("media_id")["feature"].iloc[0] == pytest.approx(
        again.sort_values("media_id")["feature"].iloc[0]
    )

    resized = ds.map_batches(ImageResizeStage, fn_constructor_args=(64, 64),
                             batch_format="pyarrow", concurrency=1).to_pandas()
    assert (resized["width"] == 64).all()

    frames = ds.map_batches(FrameSampleStage, batch_format="pyarrow",
                            concurrency=1).to_pandas()
    assert (frames.groupby("media_id").size() == 3).all()  # 3500ms @ 1000ms

    with pytest.raises(NotImplementedError):
        ImageFeatureStage(decoder="pil")


def test_raw_rgb_decode_features_resize():
    import numpy as np

    from solr_ray.ops.multimodal import (
        decode_raw_rgb, raw_rgb_features, resize_raw_rgb)

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    rt = decode_raw_rgb(img.tobytes(), 16, 12)
    assert np.array_equal(rt, img)
    with pytest.raises(ValueError):
        decode_raw_rgb(img.tobytes()[:-1], 16, 12)

    f = raw_rgb_features(img, hist_bins=8)
    assert f.shape == (14,)
    assert np.allclose(f[:3], img.reshape(-1, 3).mean(axis=0), atol=1e-3)
    assert abs(f[6:].sum() - 1.0) < 1e-5  # histogram normalized

    small = resize_raw_rgb(img, 4, 3)
    assert small.shape == (3, 4, 3)
    assert np.array_equal(small[0, 0], img[0, 0])  # NN keeps source pixels
    big = resize_raw_rgb(small, 8, 6)
    assert big.shape == (6, 8, 3)


def test_raw_image_stage_and_resize(ray_session):
    import numpy as np
    import ray.data

    from solr_ray.ops.multimodal import ImageFeatureStage, ImageResizeStage

    rng = np.random.default_rng(6)
    rows = []
    for i in range(6):
        img = rng.integers(0, 256, (10, 10, 3), dtype=np.uint8)
        rows.append({"media_id": i, "payload": img.tobytes(),
                     "width": 10, "height": 10})
    rows.append({"media_id": 99, "payload": None, "width": 10, "height": 10})
    ds = ray.data.from_items(rows)
    feat = ds.map_batches(ImageFeatureStage, batch_format="pyarrow",
                          concurrency=2, batch_size=4,
                          fn_constructor_kwargs={"decoder": "raw",
                                                 "dim": 14}).to_pandas()
    assert feat.decode_ok.sum() == 6
    assert all(len(f) == 14 for f in feat.feature)

    rs = ds.map_batches(ImageResizeStage, batch_format="pyarrow",
                        concurrency=2, batch_size=4,
                        fn_constructor_kwargs={"target_w": 4, "target_h": 5,
                                               "mode": "raw"}).to_pandas()
    good = rs[rs.media_id != 99]
    assert all(len(p) == 4 * 5 * 3 for p in good.payload)
    assert (rs.width == 4).all() and (rs.height == 5).all()


def test_raw_video_frame_sampling(ray_session):
    import numpy as np
    import ray.data

    from solr_ray.ops.multimodal import FrameSampleStage

    w = h = 4
    n_frames = 10
    frames = [np.full((h, w, 3), i, dtype=np.uint8) for i in range(n_frames)]
    payload = b"".join(f.tobytes() for f in frames)
    ds = ray.data.from_items([{
        "media_id": 1, "payload": payload, "width": w, "height": h,
        "duration_ms": 5000,
    }])
    out = ds.map_batches(FrameSampleStage, batch_format="pyarrow",
                         concurrency=1,
                         fn_constructor_kwargs={"every_ms": 1000,
                                                "mode": "raw"}).to_pandas()
    assert len(out) == 5
    # the frame bytes are REAL slices of the source frames
    for _, r in out.iterrows():
        fi = min(int(r.frame_offset_ms / 5000 * n_frames), n_frames - 1)
        assert r.frame == frames[fi].tobytes()


def test_raw_pcm_audio_features(ray_session):
    import numpy as np
    import ray.data

    from solr_ray.ops.multimodal import (
        AudioFeatureStage, decode_raw_pcm16, raw_pcm_features)

    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    # pure 440 Hz tone at half amplitude
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t))
    pcm = (tone * 32768.0).astype("<i2").tobytes()

    s = decode_raw_pcm16(pcm)
    assert abs(s.max() - 0.5) < 0.01
    f = raw_pcm_features(s, sr, n_bands=8)
    rms, zcr, centroid = f[0], f[1], f[2]
    assert abs(rms - 0.5 / np.sqrt(2)) < 0.01      # sine RMS = A/sqrt(2)
    assert abs(centroid - 440.0) < 10.0            # spectral peak at 440 Hz
    assert abs(zcr - 2 * 440 / sr) < 0.01          # 2 crossings per cycle
    assert abs(f[3:].sum() - 1.0) < 1e-4           # band energies normalized

    with pytest.raises(ValueError):
        decode_raw_pcm16(b"\x00\x01\x02")           # odd length

    ds = ray.data.from_items([
        {"media_id": 0, "payload": pcm},
        {"media_id": 1, "payload": None},
    ])
    out = ds.map_batches(AudioFeatureStage, batch_format="pyarrow",
                         concurrency=1).to_pandas()
    assert out.decode_ok.tolist() == [True, False]
    assert len(out.audio_feature[0]) == 11


def test_null_and_empty_text_edges(ray_session):
    """Null-typed text columns (Ray's per-item blocks) and empty inputs
    flow through the text/window operators without crashing."""
    import pyarrow as pa
    import ray.data

    from solr_ray.ops.textstats import LangIdStage, quality_features
    from solr_ray.ops.windows import timeseries

    nulls = ray.data.from_items([
        {"doc_id": 1, "text": None}, {"doc_id": 2, "text": "a b"}])
    q = nulls.map_batches(lambda t: quality_features(t, "text"),
                          batch_format="pyarrow").to_pandas()
    assert len(q) == 2 and q["n_tokens"].min() >= 0
    lg = nulls.map_batches(LangIdStage("text"),
                           batch_format="pyarrow").to_pandas()
    assert lg["lang_pred"].tolist() == ["und", "und"]

    ev_empty = ray.data.from_arrow(pa.table({
        "ts": pa.array([], pa.timestamp("us")),
    }))
    out = timeseries(ev_empty, "ts", "day", {"n": ("ts", "count")})
    assert out.count() == 0
    assert out.schema().names == ["bucket", "n"]


def test_batch_simhash_and_profile_match_scalar_reference():
    """The vectorized batch paths must stay value-identical to the per-row
    reference implementations (which mirror the reference Java)."""
    from solr_ray.ops.dedup import (add_simhash, add_text_profile_sig,
                                    simhash64, text_profile_signature)

    rng = np.random.default_rng(5)
    words = ["apple", "banana", "cat", "éclair", "ñu", "a", "the", "42",
             "go", "zz"]
    texts = [" ".join(rng.choice(words, int(k))) if k else ""
             for k in rng.integers(0, 40, 200)]
    texts += ["", None, "a", "  ", "apple apple apple banana",
              " ".join(rng.choice(words, 3000))]
    t = pa.table({"text": pa.array(texts, pa.string())})
    got_sh = add_simhash(t, "text")["simhash"].to_numpy(
        zero_copy_only=False)
    want_sh = np.array([simhash64(x or "", "simple") for x in texts],
                       dtype=np.uint64)
    assert (got_sh == want_sh).all()
    got_pr = add_text_profile_sig(t, "text")["sig"].to_pylist()
    want_pr = [text_profile_signature(x or "", "simple") for x in texts]
    assert got_pr == want_pr
