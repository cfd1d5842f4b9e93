"""Text-analysis operators vs DuckDB string-function oracles."""

from __future__ import annotations

from conftest import SF_CHECK, assert_frames_match, to_pdf

DOCS = f"{SF_CHECK}/documents.parquet"


def test_token_stats_matches_oracle(ddb):
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.text import token_stats

    ds = read_table(DOCS, columns=["doc_id", "text"])
    actual = to_pdf(
        ds.map_batches(token_stats, batch_format="pyarrow")
    )[["doc_id", "n_tokens", "n_chars_engine", "avg_token_len"]]
    expected = ddb.sql(
        f"""
        SELECT doc_id,
               CASE WHEN len(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
               length(text) AS n_chars_engine,
               CASE WHEN len(trim(text)) = 0 THEN 0.0
                    ELSE length(regexp_replace(text, '\\s', '', 'g'))::DOUBLE
                         / len(regexp_split_to_array(trim(text), '\\s+')) END AS avg_token_len
        FROM '{DOCS}'
        """
    ).df()
    assert_frames_match(actual, expected)


def test_quality_score_bounds_and_determinism():
    import ray.data as rd
    import pandas as pd
    from s_tsfe_dl_ray.stages.text import quality_score

    df = pd.DataFrame({
        "doc_id": range(5),
        "text": ["", "the quick fox", "!!! ??? ...", "a " * 100, "word"],
    })
    out = to_pdf(rd.from_pandas(df).map_batches(quality_score, batch_format="pyarrow"))
    assert ((out.quality >= 0) & (out.quality <= 1)).all()
    assert ((out.stopword_ratio >= 0) & (out.punct_ratio <= 1)).all()
    # pure punctuation text scores 0
    assert out.loc[out.doc_id == 2, "quality"].iloc[0] == 0.0


def test_lang_id_rules(ddb):
    import ray.data as rd
    import pandas as pd
    from s_tsfe_dl_ray.stages.text import lang_id

    df = pd.DataFrame({
        "doc_id": range(6),
        "text": [
            "the cat and the hat is on that mat",
            "der hund und die katze ist nicht da",
            "le chat est sur la table et les chaises",
            "el gato es una maravilla por que si",
            "数据库 很好",
            "xyzzy plugh",
        ],
    })
    out = to_pdf(lang_id(rd.from_pandas(df))).sort_values("doc_id")
    assert out.lang_pred.tolist() == ["en", "de", "fr", "es", "zh", "und"]


def test_md5_fingerprint_matches_oracle(ddb):
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.text import md5_fingerprint

    ds = read_table(DOCS, columns=["doc_id", "text"])
    actual = to_pdf(ds.map_batches(md5_fingerprint, batch_format="pandas"))[
        ["doc_id", "fingerprint"]
    ]
    expected = ddb.sql(
        f"""SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM '{DOCS}'"""
    ).df()
    assert_frames_match(actual, expected)


def test_rolling_fingerprint_deterministic_and_order_sensitive():
    import ray.data as rd
    import pandas as pd
    from s_tsfe_dl_ray.stages.text import rolling_fingerprint

    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a b c", "c b a", "a b c"]})
    out = to_pdf(
        rd.from_pandas(df).map_batches(rolling_fingerprint, batch_format="pandas")
    ).sort_values("doc_id")
    fps = out.fingerprint.tolist()
    assert fps[0] == fps[2]  # same content → same fingerprint
    assert fps[0] != fps[1]  # order-sensitive


def test_read_csv_typed(tmp_path, ddb):
    """readDataset analog: typed CSV read + cast + one-hot (SURVEY §2.1)."""
    import pyarrow as pa

    from conftest import to_pdf
    from s_tsfe_dl_ray.sources.parquet import read_csv_typed
    from s_tsfe_dl_ray.stages.transform import binarize_label, one_hot

    p = tmp_path / "kdd.csv"
    p.write_text(
        "duration,protocol,label\n"
        "1,tcp,normal.\n2,udp,smurf.\n3,tcp,normal.\n0,icmp,neptune.\n"
    )
    ds = read_csv_typed(str(p), dtypes={"duration": pa.float64()})
    ds = one_hot(ds, col="protocol", categories=["tcp", "udp", "icmp"])
    ds = binarize_label(ds, col="label", normal_value="normal.")
    # block arrival order is not deterministic under load — sort first
    df = to_pdf(ds).sort_values("duration").reset_index(drop=True)
    assert df.duration.dtype.kind == "f"
    assert (df.filter(like="protocol_").sum(axis=1) == 1).all()
    assert df.label_bin.tolist() == [1, 0, 1, 0]  # durations 0,1,2,3


def test_normalize_text_matches_duckdb(ddb):
    """NFC + whitespace collapse + lower must match the SQL twin exactly
    (combining marks, fullwidth chars, tabs/newlines, empties)."""
    import pandas as pd
    import ray.data as rd

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.text import normalize_text

    texts = [
        "  Héllo \t Wörld \n ",      # precomposed + messy ws
        "e\u0301clair  E\u0301CLAIR",  # combining acute -> NFC composes
        "", "   ", "MiXeD   Case",
    ]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = to_pdf(
        ds.map_batches(normalize_text, batch_format="pyarrow")
        .select_columns(["doc_id", "text_norm"]).sort("doc_id")
    )
    ddb.register("norm_t", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    exp = ddb.sql(
        "SELECT doc_id, nfc_normalize(lower(trim(regexp_replace(text, "
        "'\\s+', ' ', 'g')))) AS text_norm FROM norm_t ORDER BY doc_id"
    ).df()
    assert got["text_norm"].tolist() == exp["text_norm"].tolist()
    assert got["text_norm"][1] == "\u00e9clair \u00e9clair"  # composed
