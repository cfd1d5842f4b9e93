"""Dedup operators: exact vs DuckDB; MinHash/SimHash vs brute-force oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data

from conftest import SF_CHECK, assert_frames_match, to_pdf


def test_exact_dedup_matches_oracle(ddb):
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.dedup import exact_dedup_ids

    ds = read_table(f"{SF_CHECK}/documents.parquet", columns=["doc_id", "text"])
    actual = to_pdf(exact_dedup_ids(ds, text_col="text", id_col="doc_id"))
    expected = ddb.sql(
        f"""SELECT md5(text) AS h, min(doc_id) AS doc_id
            FROM '{SF_CHECK}/documents.parquet' GROUP BY text"""
    ).df()
    assert_frames_match(actual, expected)


def test_first_per_key_matches_oracle(ddb):
    from s_tsfe_dl_ray.sources.parquet import read_events
    from s_tsfe_dl_ray.stages.dedup import first_per_key

    ds = read_events(SF_CHECK, columns=["event_id", "user_id", "event_type", "ts", "value"])
    actual = to_pdf(first_per_key(ds, keys=["user_id", "event_type"], order_by=["ts", "event_id"]))
    expected = ddb.sql(
        f"""
        SELECT event_id, user_id, event_type, ts, value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id) AS rn
          FROM '{SF_CHECK}/events.parquet'
        ) WHERE rn = 1
        """
    ).df()
    assert_frames_match(actual, expected)


@pytest.fixture(scope="module")
def dup_docs():
    """Small corpus with planted near-duplicates (deterministic)."""
    rng = np.random.default_rng(7)
    vocab = np.array("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                     "lambda mu nu xi omicron pi rho sigma tau upsilon".split())
    base = [" ".join(rng.choice(vocab, size=60)) for _ in range(40)]
    rows = []
    for i, t in enumerate(base):
        rows.append({"doc_id": i, "text": t})
    # near-dups: copy docs 0-4 with one word changed
    for j in range(5):
        words = base[j].split()
        words[10] = "CHANGED"
        rows.append({"doc_id": 100 + j, "text": " ".join(words)})
    # one exact dup
    rows.append({"doc_id": 200, "text": base[0]})
    return pd.DataFrame(rows)


def _exact_jaccard_pairs(df: pd.DataFrame, n: int, threshold: float) -> set[tuple[int, int]]:
    from s_tsfe_dl_ray.stages.dedup import word_shingles

    sets = {r.doc_id: set(word_shingles(r.text, n)) for r in df.itertuples()}
    ids = sorted(sets)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            u = len(sets[a] | sets[b])
            if u and len(sets[a] & sets[b]) / u >= threshold:
                out.add((a, b))
    return out


def test_minhash_dedup_finds_planted_dups(dup_docs):
    from s_tsfe_dl_ray.stages.dedup import minhash_dedup_pairs

    ds = ray.data.from_pandas(dup_docs)
    got = to_pdf(minhash_dedup_pairs(ds, id_col="doc_id", threshold=0.5))
    got_pairs = set(zip(got.id_a.astype(int), got.id_b.astype(int)))
    expected = _exact_jaccard_pairs(dup_docs, 3, 0.5)
    # verified pairs are exact-Jaccard-checked → no false positives
    assert got_pairs <= expected
    # planted near-dups + the exact dup must be found
    for j in range(5):
        assert (j, 100 + j) in got_pairs
    assert (0, 200) in got_pairs


def test_simhash_finds_exact_and_near_dups(dup_docs):
    from s_tsfe_dl_ray.stages.dedup import simhash_dedup_pairs

    ds = ray.data.from_pandas(dup_docs)
    got = to_pdf(simhash_dedup_pairs(ds, id_col="doc_id", max_hamming=6))
    got_pairs = set(zip(got.id_a.astype(int), got.id_b.astype(int)))
    assert (0, 200) in got_pairs           # identical text → hamming 0
    row = got[(got.id_a == 0) & (got.id_b == 200)]
    assert (row.hamming == 0).all()


def test_simhash_signature_deterministic(dup_docs):
    from s_tsfe_dl_ray.stages.dedup import simhash_signatures

    ds = ray.data.from_pandas(dup_docs)
    a = to_pdf(simhash_signatures(ds, id_col="doc_id")).sort_values("doc_id")
    b = to_pdf(simhash_signatures(ds, id_col="doc_id")).sort_values("doc_id")
    assert (a.simhash.to_numpy() == b.simhash.to_numpy()).all()


def test_ngram_jaccard_exact_and_hot_gram_cap():
    """ngram_jaccard_pairs matches the brute-force oracle; with a DF cap a
    stopword-flooded corpus stays bounded (hot gram skipped) while pairs
    sharing any rare gram are still found."""
    from s_tsfe_dl_ray.stages.dedup import ngram_jaccard_pairs

    rng = np.random.default_rng(11)
    vocab = np.array("red orange yellow green blue indigo violet cyan".split())
    # every doc starts with the same 3 stopwords -> one gram with DF = n_docs
    docs = []
    for i in range(30):
        body = " ".join(rng.choice(vocab, size=12))
        docs.append({"doc_id": i, "text": "the of and " + body})
    # planted near-dup pair sharing many rare grams
    docs.append({"doc_id": 100, "text": docs[0]["text"] + " extra"})
    df = pd.DataFrame(docs)
    ds = ray.data.from_pandas(df)

    uncapped = to_pdf(ngram_jaccard_pairs(ds, id_col="doc_id", n=3, threshold=0.3))
    exp = _exact_jaccard_pairs_strict(df, 3, 0.3)
    assert set(zip(uncapped.id_a.astype(int), uncapped.id_b.astype(int))) == set(exp)
    for (a, b), j in exp.items():
        row = uncapped[(uncapped.id_a == a) & (uncapped.id_b == b)]
        assert abs(float(row.jaccard.iloc[0]) - j) < 1e-12

    # cap below the stopword gram's DF: the hot gram is excluded from
    # intersections, so scores are lower bounds; the planted pair still
    # surfaces through its many rare shared grams
    capped = to_pdf(ngram_jaccard_pairs(ds, id_col="doc_id", n=3, threshold=0.3,
                                        max_gram_df=5))
    capped_pairs = set(zip(capped.id_a.astype(int), capped.id_b.astype(int)))
    assert (0, 100) in capped_pairs
    # no pair can exceed its uncapped jaccard
    for r in capped.itertuples():
        assert r.jaccard <= exp[(int(r.id_a), int(r.id_b))] + 1e-12


def _exact_jaccard_pairs_strict(df: pd.DataFrame, n: int, threshold: float) -> dict:
    from s_tsfe_dl_ray.stages.dedup import word_shingles

    sets = {r.doc_id: set(word_shingles(r.text, n, strict=True)) for r in df.itertuples()}
    ids = sorted(sets)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            u = len(sets[a] | sets[b])
            if u and len(sets[a] & sets[b]) / u >= threshold:
                out[(a, b)] = len(sets[a] & sets[b]) / u
    return out


def test_prep_documents_neardup_end_to_end(tmp_path):
    """Composite near-dup prep: quality/lang filter -> normalize ->
    n-gram pairs -> components -> one survivor per cluster.  Planted:
    a 3-doc near-dup chain (case/whitespace variants + one-word edit),
    an unrelated keeper, a junk doc, and a non-English doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s_tsfe_dl_ray.pipelines.docs_prep import prep_documents_neardup

    base = ("the quick brown fox jumps over the lazy dog while the "
            "farmer watches the field and the river runs past the mill")
    variant_ws = "  The  quick BROWN fox jumps over the lazy dog while the " \
                 "farmer watches the field and the river runs past the mill "
    variant_edit = ("the quick brown fox jumps over the lazy dog while the "
                    "farmer watches the field and the river runs past the barn")
    other = ("a completely different document about the weather today with "
             "plenty of sunshine and a mild breeze over the coast and the hills")
    junk = "!!! ??? !!!"
    es = ("el rapido zorro marron salta sobre el perro perezoso mientras el "
          "granjero mira el campo y el rio pasa por el molino con la luz")
    docs = pa.table({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [base, variant_ws, variant_edit, other, junk, es],
    })
    p = tmp_path / "documents.parquet"
    pq.write_table(docs, str(p))
    out = prep_documents_neardup(str(p), jaccard=0.5).to_pandas()
    kept = set(out.doc_id)
    assert 5 not in kept and 6 not in kept      # junk + non-English filtered
    assert 4 in kept                            # unrelated doc survives
    assert kept & {1, 2, 3} == {1}              # one survivor per cluster
    comp = out.set_index("doc_id").component
    assert comp[1] == 1 and comp[4] == 4
    assert {"n_tokens", "quality", "lang_pred"} <= set(out.columns)


# ---------------------------------------------------------------------------
# 5o: blocked edit-distance near-dup
# ---------------------------------------------------------------------------


def test_levenshtein_kernel_matches_duckdb():
    """The multi-pair byte DP is bit-identical to DuckDB ``levenshtein``
    on adversarial strings: empties, multibyte UTF-8 (accents/CJK),
    transpositions, long near-identical strings."""
    import itertools
    import random

    import duckdb

    from s_tsfe_dl_ray.stages.dedup import (_levenshtein_pairs,
                                            _pad_bytes_matrix)

    random.seed(7)
    pool = ["", " ", "héllo", "hello", "naïve", "数据处理", "abc", "acb",
            "abcd" * 30, "abdc" * 30 + "x", "ß", "ss",
            "the fast data merge"]
    alpha = "abé数 "
    pool += ["".join(random.choice(alpha)
                     for _ in range(random.randint(0, 50)))
             for _ in range(30)]
    pairs = list(itertools.combinations(range(len(pool)), 2))
    A = [pool[i] for i, _ in pairs]
    B = [pool[j] for _, j in pairs]
    Ma, la = _pad_bytes_matrix(pa.array(A, pa.string()))
    Mb, lb = _pad_bytes_matrix(pa.array(B, pa.string()))
    got = _levenshtein_pairs(Ma, la, Mb, lb)
    exp = duckdb.connect().execute(
        "SELECT levenshtein(a, b) FROM (SELECT unnest(?) a, unnest(?) b)",
        [A, B]).df().iloc[:, 0].to_numpy()
    assert (got == exp).all()


def test_edit_distance_pairs_planted(ray_session, tmp_path):
    """Planted near-dups inside one prefix block are found with exact
    distances; cross-block near-dups are (by design) not candidates."""
    import ray as _ray

    from s_tsfe_dl_ray.stages.dedup import edit_distance_pairs

    base = "the quick brown fox jumps over the lazy dog near the river"
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            base,
            base.replace("lazy", "hazy"),          # dist 1, same block
            base + " bank",                         # dist 5, same block
            "zzz " + base,                          # diff block: missed
            "completely unrelated text about sunny coastal weather",
        ], pa.string()),
    })
    out = edit_distance_pairs(
        _ray.data.from_arrow(docs), prefix_len=12, max_dist=10).to_pandas()
    got = {(a, b): d for a, b, d in
           zip(out.id_a, out.id_b, out.dist)}
    assert got == {(1, 2): 1, (1, 3): 5, (2, 3): 6}
