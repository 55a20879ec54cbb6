"""Schema field-type analogs with non-trivial semantics: EnumFieldType
and CurrencyFieldType.

Reference semantics:
- EnumFieldType (solr/core/src/java/org/apache/solr/schema/
  EnumFieldType.java, EnumMapping): a configured ordered value list;
  values index/sort/range-query by their ORDINAL, not lexically;
  unknown values are rejected at index time.
- CurrencyFieldType (solr/core/src/java/org/apache/solr/schema/
  CurrencyFieldType.java + FileExchangeRateProvider): "amount,CODE"
  strings stored as long CENTS + currency code; range queries and
  sorting convert through an (asymmetric) exchange-rate table into the
  query currency.

Ray-native shape: both are pure vectorized Arrow kernels meant for
map_batches — the enum table / rate table is tiny constant state baked
into the closure (broadcast once with the task, never per row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class EnumField:
    """Ordered enum: ordinal = position in `values` (EnumMapping)."""

    def __init__(self, values: list[str]):
        if len(set(values)) != len(values):
            raise ValueError("enum values must be unique")
        self.values = list(values)
        self._arr = pa.array(self.values, pa.string())

    def encode(self, arr) -> pa.Array:
        """string column -> int32 ordinals; null passes through; an
        unknown value raises (Solr rejects it at index time)."""
        if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
            arr = pa.array(arr, pa.string())
        idx = pc.index_in(arr, value_set=self._arr)
        bad = pc.and_(pc.is_null(idx), pc.is_valid(arr))
        if pc.any(bad).as_py():
            sample = arr.filter(bad)[0].as_py()
            raise ValueError(f"unknown enum value {sample!r}")
        return idx

    def decode(self, ordinals) -> pa.Array:
        if not isinstance(ordinals, (pa.Array, pa.ChunkedArray)):
            ordinals = pa.array(ordinals)
        return pc.take(self._arr, pc.cast(ordinals, pa.int32()))

    def encode_batch(self, t: pa.Table, col: str,
                     out_col: str | None = None) -> pa.Table:
        return t.append_column(out_col or f"{col}_ord",
                               self.encode(t[col]))


class CurrencyField:
    """'amount,CODE' currency values with exchange-rate conversion.

    Amounts quantize to integer CENTS (floor(x*100 + 0.5), exact for
    2-decimal inputs and identical to SQL FLOOR arithmetic) — the same
    long-cents storage the reference uses — so converted values replay
    bit-exactly in an oracle as FLOOR(amount*100 + 0.5) * rate / 100.

    `rates` maps (from_code, to_code) -> rate; asymmetric pairs are
    honored exactly as FileExchangeRateProvider does (no implied
    inverse). Identity (c, c) is implicit.
    """

    def __init__(self, rates: dict[tuple[str, str], float],
                 default_currency: str = "USD"):
        self.rates = dict(rates)
        self.default_currency = default_currency

    def parse(self, arr):
        """'12.99,EUR' strings -> (cents int64, code string). A bare
        amount gets the default currency; null rows stay null."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        elif not isinstance(arr, pa.Array):
            arr = pa.array(arr, pa.string())
        none_i, none_s = (pa.scalar(None, pa.int64()),
                          pa.scalar(None, pa.string()))
        parts = pc.split_pattern(arr, ",", max_splits=1)
        flat = pc.list_flatten(parts)
        if len(flat) == 0:  # all rows null/empty
            return (pa.nulls(len(arr), pa.int64()),
                    pa.nulls(len(arr), pa.string()))
        lens = pc.fill_null(pc.list_value_length(parts), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        amount = pc.cast(pc.utf8_trim_whitespace(pc.take(
            flat, pa.array(np.where(lens > 0, offs[:-1], 0), pa.int64()))),
            pa.float64())
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            amount, pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        has_amt = pa.array(lens > 0)
        cents = pc.if_else(has_amt, cents, none_i)
        code_s = pc.utf8_trim_whitespace(pc.take(
            flat, pa.array(np.where(lens > 1, offs[1:] - 1, 0), pa.int64())))
        code = pc.if_else(
            has_amt,
            pc.if_else(pa.array(lens > 1), code_s,
                       pa.scalar(self.default_currency, pa.string())),
            none_s)
        return cents, code

    def _rate_vector(self, codes, to: str):
        uniq = [c for c in pc.unique(
            codes if isinstance(codes, (pa.Array, pa.ChunkedArray))
            else pa.array(codes)).to_pylist() if c is not None]
        vec = []
        for c in uniq:
            if c == to:
                vec.append(1.0)
            elif (c, to) in self.rates:
                vec.append(float(self.rates[(c, to)]))
            else:
                raise ValueError(f"no exchange rate {c} -> {to}")
        return pa.array(uniq, pa.string()), np.array(vec, np.float64)

    def convert(self, cents, codes, to: str) -> pa.Array:
        """cents + code columns -> float64 amount in `to` currency:
        cents * rate / 100, rate looked up per distinct code."""
        uniq, vec = self._rate_vector(codes, to)
        idx = pc.index_in(codes, value_set=uniq)
        rate = pa.array(
            vec[np.asarray(pc.fill_null(idx, 0))], pa.float64())
        out = pc.divide(pc.multiply(
            pc.cast(cents, pa.float64()), rate), pa.scalar(100.0))
        return pc.if_else(pc.is_valid(cents), out,
                          pa.scalar(None, pa.float64()))

    def convert_batch(self, t: pa.Table, col: str, to: str,
                      out_col: str) -> pa.Table:
        cents, codes = self.parse(t[col])
        return t.append_column(out_col, self.convert(cents, codes, to))
