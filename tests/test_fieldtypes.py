"""EnumFieldType / CurrencyFieldType analogs (functions/fieldtypes.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from solr_ray.functions.fieldtypes import CurrencyField, EnumField


def test_enum_encode_decode_roundtrip():
    e = EnumField(["low", "medium", "high"])
    vals = pa.array(["high", "low", None, "medium", "high"])
    ords = e.encode(vals)
    assert ords.to_pylist() == [2, 0, None, 1, 2]
    assert e.decode(ords).to_pylist() == [
        "high", "low", None, "medium", "high"]
    with pytest.raises(ValueError, match="unknown enum value"):
        e.encode(pa.array(["bogus"]))
    with pytest.raises(ValueError, match="unique"):
        EnumField(["a", "a"])


def test_enum_ordinal_sort_not_lexical():
    # the whole point of EnumFieldType: 'high' < 'low' lexically but
    # ordinal order is the configured one
    e = EnumField(["low", "medium", "high"])
    vals = pa.array(["medium", "high", "low"])
    order = pc.sort_indices(e.encode(vals))
    assert pc.take(vals, order).to_pylist() == ["low", "medium", "high"]


def test_currency_parse_variants():
    c = CurrencyField({("EUR", "USD"): 1.25}, default_currency="USD")
    cents, code = c.parse(pa.array(
        ["12.99,EUR", "5", " 7.10 , EUR ", None, "0.01"]))
    assert cents.to_pylist() == [1299, 500, 710, None, 1]
    assert code.to_pylist() == ["EUR", "USD", "EUR", None, "USD"]


def test_currency_convert_asymmetric_rates():
    c = CurrencyField({("EUR", "USD"): 1.25, ("USD", "EUR"): 0.5,
                       ("GBP", "USD"): 2.0})
    cents, code = c.parse(pa.array(["10,EUR", "10,USD", "10,GBP"]))
    usd = c.convert(cents, code, "USD").to_pylist()
    assert usd == [12.5, 10.0, 20.0]
    # asymmetric: USD->EUR uses ITS OWN configured rate, not 1/1.25
    eur = c.convert(*c.parse(pa.array(["10,USD"])), "EUR").to_pylist()
    assert eur == [5.0]
    with pytest.raises(ValueError, match="no exchange rate"):
        c.convert(*c.parse(pa.array(["1,JPY"])), "USD")


def test_currency_cents_match_sql_floor(ray_session):
    """The cents quantization replays as FLOOR(x*100 + 0.5) in DuckDB —
    the contract the currency oracle relies on."""
    import duckdb

    rng = np.random.default_rng(11)
    x = np.round(rng.uniform(0.01, 500000, 2000), 2)
    c = CurrencyField({})
    cents, _ = c.parse(pa.array([f"{v}" for v in x]))
    con = duckdb.connect()
    con.register("t", pa.table({"x": x}))
    want = con.execute(
        "SELECT CAST(FLOOR(x*100 + 0.5) AS BIGINT) AS c FROM t"
    ).df()["c"].to_numpy()
    con.close()
    assert (np.asarray(cents) == want).all()


def test_fieldtypes_in_map_batches(ray_session):
    import ray.data

    e = EnumField(["de", "en", "fr"])
    cur = CurrencyField({("EUR", "USD"): 1.25})
    t = pa.table({"lang": ["en", "de", "fr", "en"],
                  "price": ["1,EUR", "2", "3.50,EUR", "4.25"]})
    ds = ray.data.from_arrow(t).map_batches(
        lambda b: cur.convert_batch(
            e.encode_batch(b, "lang"), "price", "USD", "usd"),
        batch_format="pyarrow")
    df = ds.to_pandas()
    assert df["lang_ord"].tolist() == [1, 0, 2, 1]
    assert df["usd"].tolist() == [1.25, 2.0, 4.375, 4.25]
