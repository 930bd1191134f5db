"""Vectorized expression evaluation over columnar batches.

Analog of the reference's ExpressionExecutor (reference
src/execution/expression_executor.cpp:70 Execute / :225 Select): an expression
tree is evaluated over a batch of fixed-shape device arrays, producing either
a value column (`eval`) or a boolean mask (`Select` becomes mask production;
compaction to a selection vector is a separate explicit kernel).

TPU-first design decisions:
 - All control flow is data-parallel `where`; no per-row branching.
 - DECIMAL arithmetic is exact int64 fixed point with DuckDB's scale rules
   (add/sub align scales, mul adds scales, div promotes to DOUBLE).
 - String predicates resolve against the column's *sorted* dictionary at
   trace time (host binary search), then execute as int32 code comparisons
   on device.  LIKE/IN compile to a host-computed per-dictionary-code truth
   table gathered through the code column.
"""

from __future__ import annotations

import dataclasses
import fnmatch
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..types import (BOOL, CHAR1, DATE, DOUBLE, INT32, INT64, VARCHAR,
                     DataType, TypeId, date_to_days, decimal_to_int)


@dataclasses.dataclass
class ColMeta:
    """Trace-time metadata of a bound column."""
    dtype: DataType
    dictionary: np.ndarray | None = None
    # sorted distinct values (host) for small-domain columns — drives the
    # dense (perfect-hash) aggregate path and propagates through
    # expressions like extract(year)
    domain: np.ndarray | None = None


class EvalContext:
    """A batch: named device arrays + trace-time column metadata."""

    def __init__(self, arrays: dict[str, jnp.ndarray], meta: dict[str, ColMeta],
                 valids: dict[str, Any] | None = None):
        self.arrays = arrays
        self.meta = meta
        # per-column NULL validity (None = all valid) — the analog of the
        # reference's per-value ValidityMask (validity_mask.hpp:50)
        self.valids = valids or {}


@dataclasses.dataclass(frozen=True)
class Typed:
    array: Any  # jnp array
    dtype: DataType
    dictionary: np.ndarray | None = None
    # bool array marking non-NULL slots; None = all valid
    valid: Any = None
    # sorted distinct values (host metadata), when known small
    domain: np.ndarray | None = None


def and_valid(a, b):
    """Combine two validity arrays (None = all valid)."""
    if a is None:
        return b
    if b is None:
        return a
    return a & b


def as_mask(t: Typed):
    """Boolean expression -> WHERE-mask semantics: NULL counts as false."""
    if t.valid is None:
        return t.array
    return t.array & t.valid


class Expr:
    def eval(self, ctx: EvalContext) -> Typed:
        raise NotImplementedError

    # sugar ---------------------------------------------------------------
    def __add__(self, o): return Arith("+", self, wrap(o))
    def __radd__(self, o): return Arith("+", wrap(o), self)
    def __sub__(self, o): return Arith("-", self, wrap(o))
    def __rsub__(self, o): return Arith("-", wrap(o), self)
    def __mul__(self, o): return Arith("*", self, wrap(o))
    def __rmul__(self, o): return Arith("*", wrap(o), self)
    def __truediv__(self, o): return Arith("/", self, wrap(o))
    def __rtruediv__(self, o): return Arith("/", wrap(o), self)
    def __eq__(self, o): return Compare("==", self, wrap(o))  # type: ignore
    def __ne__(self, o): return Compare("!=", self, wrap(o))  # type: ignore
    def __lt__(self, o): return Compare("<", self, wrap(o))
    def __le__(self, o): return Compare("<=", self, wrap(o))
    def __gt__(self, o): return Compare(">", self, wrap(o))
    def __ge__(self, o): return Compare(">=", self, wrap(o))
    def __and__(self, o): return BoolOp("and", self, wrap(o))
    def __or__(self, o): return BoolOp("or", self, wrap(o))
    def __invert__(self): return NotOp(self)
    def __hash__(self):  # Expr __eq__ builds nodes, so hash by identity
        return id(self)

    def between(self, lo, hi):
        return (self >= wrap(lo)) & (self <= wrap(hi))

    def isin(self, values):
        return InList(self, list(values))

    def like(self, pattern: str):
        return Like(self, pattern)

    def not_like(self, pattern: str):
        return NotOp(Like(self, pattern))

    def year(self):
        return ExtractYear(self)

    def cast_double(self):
        return CastDouble(self)


def wrap(v) -> "Expr":
    return v if isinstance(v, Expr) else Lit(v)


@dataclasses.dataclass(eq=False)
class Col(Expr):
    name: str

    def eval(self, ctx):
        m = ctx.meta[self.name]
        return Typed(ctx.arrays[self.name], m.dtype, m.dictionary,
                     ctx.valids.get(self.name), domain=m.domain)


@dataclasses.dataclass(eq=False)
class Lit(Expr):
    value: Any
    dtype: DataType | None = None

    def eval(self, ctx):
        v, dt = self.value, self.dtype
        if dt is None:
            if isinstance(v, bool):
                dt = BOOL
            elif isinstance(v, int):
                dt = INT64
            elif isinstance(v, float):
                dt = DOUBLE
            elif isinstance(v, str):
                dt = VARCHAR
            else:
                raise TypeError(f"cannot infer literal type of {v!r}")
        return Typed(v, dt, None)


def date_lit(s: str) -> Lit:
    return Lit(date_to_days(s), DATE)


def dec_lit(v, scale: int = 2) -> Lit:
    return Lit(decimal_to_int(v, scale), DataType(TypeId.DECIMAL, scale))


# -------------------------------------------------------------- arithmetic

def _rescale(t: Typed, scale: int) -> Typed:
    cur = t.dtype.scale if t.dtype.id == TypeId.DECIMAL else 0
    if cur == scale:
        return t
    assert scale > cur, "decimal downscale requires explicit rounding"
    factor = 10 ** (scale - cur)
    arr = t.array * (jnp.int64(factor) if not _is_host_scalar(t.array) else factor)
    return Typed(arr, DataType(TypeId.DECIMAL, scale), None)


def _is_host_scalar(x) -> bool:
    return isinstance(x, (int, float, bool, np.integer, np.floating))


def _as_double(t: Typed):
    arr = t.array
    scale = t.dtype.scale if t.dtype.id == TypeId.DECIMAL else 0
    if t.dtype.id == TypeId.DOUBLE:
        return arr
    if _is_host_scalar(arr):
        return float(arr) / (10 ** scale)
    return arr.astype(jnp.float64) / (10 ** scale)


_DECIMALISH = (TypeId.INT32, TypeId.INT64, TypeId.DECIMAL, TypeId.DATE)


@dataclasses.dataclass(eq=False)
class Arith(Expr):
    op: str
    left: Expr
    right: Expr

    def eval(self, ctx):
        lt, rt = self.left.eval(ctx), self.right.eval(ctx)
        v = and_valid(lt.valid, rt.valid)
        if self.op == "%":
            # SQL mod: integer when both sides integer, else double fmod
            if TypeId.DOUBLE in (lt.dtype.id, rt.dtype.id) or \
                    TypeId.DECIMAL in (lt.dtype.id, rt.dtype.id):
                return Typed(jnp.fmod(_as_double(lt), _as_double(rt)),
                             DOUBLE, None, v)
            la = jnp.asarray(lt.array).astype(jnp.int64)
            ra = jnp.asarray(rt.array).astype(jnp.int64)
            # SQL mod takes the DIVIDEND's sign (reference/C semantics;
            # jnp.remainder follows the divisor)
            rem = jnp.sign(la) * (jnp.abs(la) % jnp.abs(ra))
            return Typed(rem, INT64, None, v)
        if self.op == "/" or TypeId.DOUBLE in (lt.dtype.id, rt.dtype.id):
            la, ra = _as_double(lt), _as_double(rt)
            out = {"+": lambda: la + ra, "-": lambda: la - ra,
                   "*": lambda: la * ra, "/": lambda: la / ra}[self.op]()
            return Typed(out, DOUBLE, None, v)
        assert lt.dtype.id in _DECIMALISH and rt.dtype.id in _DECIMALISH
        ls = lt.dtype.scale if lt.dtype.id == TypeId.DECIMAL else 0
        rs = rt.dtype.scale if rt.dtype.id == TypeId.DECIMAL else 0
        if self.op == "*":
            out_scale = ls + rs
            la = lt.array if _is_host_scalar(lt.array) else lt.array.astype(jnp.int64)
            ra = rt.array if _is_host_scalar(rt.array) else rt.array.astype(jnp.int64)
            out = la * ra
        else:
            out_scale = max(ls, rs)
            la = _rescale(lt, out_scale).array if ls != out_scale or lt.dtype.id == TypeId.DECIMAL else lt.array
            ra = _rescale(rt, out_scale).array if rs != out_scale or rt.dtype.id == TypeId.DECIMAL else rt.array
            if not _is_host_scalar(la):
                la = la.astype(jnp.int64)
            if not _is_host_scalar(ra):
                ra = ra.astype(jnp.int64)
            out = la + ra if self.op == "+" else la - ra
        dt = DataType(TypeId.DECIMAL, out_scale) if out_scale else (
            DATE if DATE in (lt.dtype, rt.dtype) and self.op in "+-" else INT64)
        return Typed(out, dt, None, v)


# -------------------------------------------------------------- comparison

def _resolve_string_lit(col: Typed, lit_value: str):
    """Map a string literal to dictionary-code space for ordered compares.

    Returns (code, present): `code` is the insertion point of the literal in
    the sorted dictionary; `present` says whether it is an exact member.
    """
    d = col.dictionary
    assert d is not None, "string comparison on non-dictionary column"
    b = lit_value.encode() if isinstance(lit_value, str) else lit_value
    idx = int(np.searchsorted(d, b))
    present = idx < len(d) and d[idx] == b
    return idx, present


@dataclasses.dataclass(eq=False)
class Compare(Expr):
    op: str
    left: Expr
    right: Expr

    def eval(self, ctx):
        lt, rt = self.left.eval(ctx), self.right.eval(ctx)
        v = and_valid(lt.valid, rt.valid)
        # string column vs string literal -> code comparison
        if lt.dtype.id == TypeId.VARCHAR and isinstance(rt.array, str):
            return Typed(self._varchar_cmp(lt, rt.array), BOOL, None, v)
        if rt.dtype.id == TypeId.VARCHAR and isinstance(lt.array, str):
            flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "==": "==", "!=": "!="}
            return Typed(
                Compare(flip[self.op], self.right, self.left)._varchar_cmp(rt, lt.array),
                BOOL, None, v)
        if lt.dtype.id == TypeId.CHAR1 and isinstance(rt.array, str):
            code = np.uint8(ord(rt.array))
            return Typed(self._num_cmp(lt.array, code), BOOL, None, v)
        la, ra = lt, rt
        if TypeId.DOUBLE in (lt.dtype.id, rt.dtype.id):
            return Typed(self._num_cmp(_as_double(lt), _as_double(rt)), BOOL,
                         None, v)
        ls = lt.dtype.scale if lt.dtype.id == TypeId.DECIMAL else 0
        rs = rt.dtype.scale if rt.dtype.id == TypeId.DECIMAL else 0
        s = max(ls, rs)
        if ls != s:
            la = _rescale(lt, s)
        if rs != s:
            ra = _rescale(rt, s)
        return Typed(self._num_cmp(la.array, ra.array), BOOL, None, v)

    def _num_cmp(self, la, ra):
        return {"==": lambda: la == ra, "!=": lambda: la != ra,
                "<": lambda: la < ra, "<=": lambda: la <= ra,
                ">": lambda: la > ra, ">=": lambda: la >= ra}[self.op]()

    def _varchar_cmp(self, col: Typed, lit_value: str):
        idx, present = _resolve_string_lit(col, lit_value)
        codes = col.array
        if self.op == "==":
            if not present:
                return jnp.zeros(codes.shape, jnp.bool_)
            return codes == idx
        if self.op == "!=":
            if not present:
                return jnp.ones(codes.shape, jnp.bool_)
            return codes != idx
        # ordered comparisons against the insertion point
        if self.op == "<":
            return codes < idx
        if self.op == ">=":
            return codes >= idx
        if self.op == "<=":
            return codes <= idx if present else codes < idx
        if self.op == ">":
            return codes > idx if present else codes >= idx
        raise ValueError(self.op)


@dataclasses.dataclass(eq=False)
class BoolOp(Expr):
    """AND/OR with SQL three-valued (Kleene) logic when NULLs are present.

    Values at unknown slots are forced to false so garbage in padding can
    never leak through an OR (reference analog: ValidityMask-aware
    boolean_operators.cpp).
    """
    op: str
    left: Expr
    right: Expr

    def eval(self, ctx):
        lt, rt = self.left.eval(ctx), self.right.eval(ctx)
        if lt.valid is None and rt.valid is None:
            la, ra = lt.array, rt.array
            return Typed(la & ra if self.op == "and" else la | ra, BOOL, None)
        lk = lt.valid if lt.valid is not None else jnp.ones_like(lt.array)
        rk = rt.valid if rt.valid is not None else jnp.ones_like(rt.array)
        lv = lt.array & lk
        rv = rt.array & rk
        if self.op == "and":
            value = lv & rv
            known = (lk & rk) | (lk & ~lv) | (rk & ~rv)
        else:
            value = lv | rv
            known = (lk & rk) | lv | rv
        return Typed(value, BOOL, None, known)


@dataclasses.dataclass(eq=False)
class NotOp(Expr):
    child: Expr

    def eval(self, ctx):
        t = self.child.eval(ctx)
        if t.valid is None:
            return Typed(~t.array, BOOL, None)
        return Typed(~t.array & t.valid, BOOL, None, t.valid)


# (dictionary identity, cache key) -> device truth table.  LIKE/IN over a
# near-unique VARCHAR dictionary (l_comment at SF1: millions of entries) is
# an O(|dict|) host regex pass; memoizing per (dictionary, pattern) makes
# it once-per-dictionary-version instead of once-per-execution (VERDICT r4
# weak #7).  Keyed on id(dict) — dictionaries are immutable snapshots
# (DML builds NEW merged arrays), and the bounded size caps stale entries.
_TRUTH_CACHE: dict = {}
_TRUTH_CACHE_LIMIT = 256


def _code_truth_table(col: Typed, match_fn, cache_key=None) -> jnp.ndarray:
    """Host-evaluate a predicate over the dictionary; gather per-row."""
    d = col.dictionary
    assert d is not None
    if cache_key is not None:
        key = (id(d), len(d), cache_key)
        table = _TRUTH_CACHE.get(key)
        if table is None:
            # cache the HOST array: a device constant created inside a
            # trace is a tracer and must never outlive the trace
            table = np.asarray(match_fn(d), dtype=np.bool_)
            if len(_TRUTH_CACHE) >= _TRUTH_CACHE_LIMIT:
                _TRUTH_CACHE.pop(next(iter(_TRUTH_CACHE)))
            _TRUTH_CACHE[key] = table
        return jnp.asarray(table)[col.array]
    table = jnp.asarray(np.asarray(match_fn(d), dtype=np.bool_))
    return table[col.array]


@dataclasses.dataclass(eq=False)
class InList(Expr):
    child: Expr
    values: list

    def eval(self, ctx):
        ct = self.child.eval(ctx)
        if ct.dtype.id == TypeId.VARCHAR:
            targets = set(v.encode() if isinstance(v, str) else v for v in self.values)
            return Typed(
                _code_truth_table(ct, lambda d: np.isin(d, list(targets)),
                                  cache_key=("in", tuple(sorted(targets)))),
                BOOL, None, ct.valid)
        arr = ct.array
        out = jnp.zeros(jnp.shape(arr), jnp.bool_)
        for v in self.values:
            out = out | (arr == v)
        return Typed(out, BOOL, None, ct.valid)


def like_to_regex(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


@dataclasses.dataclass(eq=False)
class Like(Expr):
    child: Expr
    pattern: str

    def eval(self, ctx):
        ct = self.child.eval(ctx)
        assert ct.dtype.id == TypeId.VARCHAR, "LIKE requires a varchar column"
        rx = re.compile(like_to_regex(self.pattern).encode())

        def match(d):
            # vectorized-ish host match over the dictionary
            return np.fromiter((rx.match(s) is not None for s in d),
                               count=len(d), dtype=np.bool_)

        return Typed(_code_truth_table(ct, match,
                                       cache_key=("like", self.pattern)),
                     BOOL, None, ct.valid)


@dataclasses.dataclass(eq=False)
class Substr(Expr):
    """substring(col, start, length) on a dictionary column.

    Computed entirely at trace time over the dictionary: each dictionary
    entry maps to its substring, the distinct substrings become a new sorted
    dictionary, and the device work is a single int32 gather through the
    code remap table.
    """
    child: Expr
    start: int  # 1-based (SQL semantics)
    length: int

    def eval(self, ctx):
        ct = self.child.eval(ctx)
        assert ct.dtype.id == TypeId.VARCHAR and ct.dictionary is not None
        subs = np.array([s[self.start - 1 : self.start - 1 + self.length]
                         for s in ct.dictionary])
        new_dict, remap = np.unique(subs, return_inverse=True)
        codes = jnp.asarray(remap.astype(np.int32))[ct.array]
        return Typed(codes, VARCHAR, new_dict, ct.valid)


@dataclasses.dataclass(eq=False)
class ExtractYear(Expr):
    child: Expr

    def eval(self, ctx):
        ct = self.child.eval(ctx)
        assert ct.dtype.id == TypeId.DATE
        days = ct.array.astype(jnp.int64)
        # civil-from-days (Hinnant's algorithm), vectorized integer ops
        z = days + 719468
        era = jnp.floor_divide(z, 146097)
        doe = z - era * 146097
        yoe = jnp.floor_divide(
            doe - jnp.floor_divide(doe, 1460) + jnp.floor_divide(doe, 36524)
            - jnp.floor_divide(doe, 146096), 365)
        y = yoe + era * 400
        doy = doe - (365 * yoe + jnp.floor_divide(yoe, 4) - jnp.floor_divide(yoe, 100))
        mp = jnp.floor_divide(5 * doy + 2, 153)
        m = mp + jnp.where(mp < 10, 3, -9)
        y = y + (m <= 2)
        dom = _year_domain(ct.domain)
        return Typed(y.astype(jnp.int64), INT64, None, ct.valid,
                     domain=dom)


@dataclasses.dataclass(eq=False)
class CastDouble(Expr):
    child: Expr

    def eval(self, ctx):
        t = self.child.eval(ctx)
        return Typed(_as_double(t), DOUBLE, None, t.valid)


@dataclasses.dataclass(eq=False)
class CastInt(Expr):
    """CAST(x AS INTEGER/BIGINT): truncation toward zero (SQL semantics)
    for doubles and decimals; integers pass through."""
    child: Expr

    def eval(self, ctx):
        t = self.child.eval(ctx)
        if t.dtype.id == TypeId.DOUBLE:
            a = t.array
            if _is_host_scalar(a):
                return Typed(int(a), INT64, None, t.valid)
            return Typed(jnp.trunc(a).astype(jnp.int64), INT64, None,
                         t.valid)
        if t.dtype.id == TypeId.DECIMAL:
            p = 10 ** t.dtype.scale
            a = t.array
            if _is_host_scalar(a):
                q = int(a) // p if a >= 0 else -((-int(a)) // p)
                return Typed(q, INT64, None, t.valid)
            a = a.astype(jnp.int64)
            q = jnp.where(a >= 0, a // p, -((-a) // p))
            return Typed(q, INT64, None, t.valid)
        return Typed(t.array, t.dtype if t.dtype.id in
                     (TypeId.INT32, TypeId.INT64, TypeId.DATE)
                     else INT64, None, t.valid)


@dataclasses.dataclass(eq=False)
class Case(Expr):
    """CASE WHEN cond THEN a ELSE b END (single branch, vectorized where)."""
    cond: Expr
    then: Expr
    other: Expr

    def eval(self, ctx):
        ct = self.cond.eval(ctx)
        c = as_mask(ct)  # NULL condition selects the ELSE branch (SQL)
        t, o = self.then.eval(ctx), self.other.eval(ctx)
        v = None
        if t.valid is not None or o.valid is not None:
            tv = t.valid if t.valid is not None else jnp.ones_like(c)
            ov = o.valid if o.valid is not None else jnp.ones_like(c)
            v = jnp.where(c, tv, ov)
        if TypeId.DOUBLE in (t.dtype.id, o.dtype.id):
            return Typed(jnp.where(c, _as_double(t), _as_double(o)), DOUBLE,
                         None, v)
        ts = t.dtype.scale if t.dtype.id == TypeId.DECIMAL else 0
        os_ = o.dtype.scale if o.dtype.id == TypeId.DECIMAL else 0
        s = max(ts, os_)
        ta = _rescale(t, s).array if ts != s else t.array
        oa = _rescale(o, s).array if os_ != s else o.array
        dt = DataType(TypeId.DECIMAL, s) if s else t.dtype
        return Typed(jnp.where(c, ta, oa), dt, None, v)


@dataclasses.dataclass(eq=False)
class IsNull(Expr):
    """IS NULL: true where the child's validity mask is unset.  The result
    itself is never NULL (three-valued logic collapses here)."""
    child: Expr

    def eval(self, ctx):
        t = self.child.eval(ctx)
        if t.valid is None:
            arr = t.array
            n = jnp.shape(arr)[0] if jnp.ndim(arr) else ()
            return Typed(jnp.zeros(n, jnp.bool_), BOOL, None)
        return Typed(~t.valid, BOOL, None)


@dataclasses.dataclass(eq=False)
class ValidIf(Expr):
    """Result is NULL wherever `cond` is not true (keeps child's values).

    Used by the binder to give aggregate rewrites exact NULL semantics —
    e.g. stddev over n<=1 rows is NULL, not NaN (reference behavior of
    STDDEV's finalize, src/core_functions/aggregate/distributive/stddev.cpp).
    """
    child: Expr
    cond: Expr

    def eval(self, ctx):
        t = self.child.eval(ctx)
        m = as_mask(self.cond.eval(ctx))
        v = m if t.valid is None else (t.valid & m)
        return Typed(t.array, t.dtype, t.dictionary, v)


def _civil_from_days(days):
    """days-since-epoch -> (year, month, day), Hinnant's algorithm
    (vectorized integer ops; same math as the reference's date_part,
    src/common/types/date.cpp)."""
    z = days.astype(jnp.int64) + 719468
    era = jnp.floor_divide(z, 146097)
    doe = z - era * 146097
    yoe = jnp.floor_divide(
        doe - jnp.floor_divide(doe, 1460) + jnp.floor_divide(doe, 36524)
        - jnp.floor_divide(doe, 146096), 365)
    y = yoe + era * 400
    doy = doe - (365 * yoe + jnp.floor_divide(yoe, 4)
                 - jnp.floor_divide(yoe, 100))
    mp = jnp.floor_divide(5 * doy + 2, 153)
    d = doy - jnp.floor_divide(153 * mp + 2, 5) + 1
    m = mp + jnp.where(mp < 10, 3, -9)
    y = y + (m <= 2)
    return y, m, d


@dataclasses.dataclass(eq=False)
class ExtractField(Expr):
    """extract(year|month|day FROM date) / date_part equivalents."""
    field: str
    child: Expr

    def eval(self, ctx):
        ct = self.child.eval(ctx)
        assert ct.dtype.id == TypeId.DATE
        y, m, d = _civil_from_days(ct.array)
        out = {"year": y, "month": m, "day": d}[self.field]
        if self.field == "year":
            dom = _year_domain(ct.domain)
        else:
            dom = np.arange(1, 13 if self.field == "month" else 32,
                            dtype=np.int64)
        return Typed(out.astype(jnp.int64), INT64, None, ct.valid,
                     domain=dom)


def _year_domain(day_domain):
    """Host: distinct civil years covered by a DATE column's day domain."""
    if day_domain is None:
        return None
    from ..types import days_to_date
    lo = days_to_date(int(day_domain[0])).year
    hi = days_to_date(int(day_domain[-1])).year
    return np.arange(lo, hi + 1, dtype=np.int64)


def _dict_strs(d) -> list[str]:
    """Dictionary entries as python str (dictionaries are stored as |S)."""
    return [s.decode("utf-8", "replace") if isinstance(s, bytes) else str(s)
            for s in d]


@dataclasses.dataclass(eq=False)
class StrMap(Expr):
    """Per-dictionary-entry string transform (upper/lower/trim/ltrim/rtrim).

    The device work is one int32 gather through a host-computed code remap —
    the dictionary analog of the reference's per-value string kernels
    (src/core_functions/scalar/string/)."""
    child: Expr
    op: str

    _FNS = {"upper": str.upper, "lower": str.lower, "trim": str.strip,
            "ltrim": str.lstrip, "rtrim": str.rstrip}

    def eval(self, ctx):
        ct = self.child.eval(ctx)
        if ct.dtype.id == TypeId.CHAR1:
            # 256-entry byte LUT
            fn = self._FNS[self.op]
            lut = np.arange(256, dtype=np.int32)
            for b in range(256):
                s = fn(chr(b))
                lut[b] = ord(s) if len(s) == 1 else (0 if not s else b)
            codes = jnp.asarray(lut)[ct.array.astype(jnp.int32)]
            return Typed(codes.astype(ct.array.dtype), ct.dtype, None,
                         ct.valid)
        assert ct.dtype.id == TypeId.VARCHAR and ct.dictionary is not None, \
            f"{self.op}() needs a dictionary-encoded varchar"
        fn = self._FNS[self.op]
        mapped = np.array([fn(s) for s in _dict_strs(ct.dictionary)],
                          dtype="S")
        new_dict, remap = np.unique(mapped, return_inverse=True)
        codes = jnp.asarray(remap.astype(np.int32))[ct.array]
        return Typed(codes, VARCHAR, new_dict, ct.valid)


@dataclasses.dataclass(eq=False)
class StrLen(Expr):
    """length(varchar) via a per-code length table."""
    child: Expr

    def eval(self, ctx):
        ct = self.child.eval(ctx)
        if ct.dtype.id == TypeId.CHAR1:
            return Typed(jnp.ones_like(ct.array, dtype=jnp.int64), INT64,
                         None, ct.valid)
        assert ct.dtype.id == TypeId.VARCHAR and ct.dictionary is not None
        lens = np.array([len(s) for s in _dict_strs(ct.dictionary)],
                        np.int64)
        return Typed(jnp.asarray(lens)[ct.array], INT64, None, ct.valid)


class ExpressionError(ValueError):
    """User-facing expression evaluation error."""


@dataclasses.dataclass(eq=False)
class Concat(Expr):
    """string concatenation (a || b): trace-time dictionary product.

    Guarded by a dictionary-size budget — the combined dictionary is
    |d1|*|d2| entries in the worst case.  Past the budget, concrete
    (non-traced) code arrays fall back to building entries only for
    OBSERVED code pairs (one host unique pass); traced evaluation raises a
    typed error instead of doing unbounded host work (ADVICE r3)."""
    left: Expr
    right: Expr
    MAX_DICT = 1 << 20

    def eval(self, ctx):
        lt, rt = self.left.eval(ctx), self.right.eval(ctx)
        # string literals arrive as Typed with a python scalar in .array
        ld, lc = self._as_literal_or_col(lt)
        rd, rc = self._as_literal_or_col(rt)
        if len(ld) * len(rd) > self.MAX_DICT:
            concrete = not (isinstance(lc, jax.core.Tracer)
                            or isinstance(rc, jax.core.Tracer))
            if lc is None or rc is None or not concrete:
                raise ExpressionError(
                    f"concat dictionary would have {len(ld) * len(rd)} "
                    f"entries (budget {self.MAX_DICT}); re-run unjitted or "
                    f"reduce operand cardinality")
            return self._observed_pairs(lt, rt, ld, rd, lc, rc)
        pairs = np.array([a + b for a in ld for b in rd], dtype="S")
        new_dict, remap = np.unique(pairs, return_inverse=True)
        remap = remap.reshape(len(ld), len(rd)).astype(np.int32)
        if lc is None and rc is None:
            return Typed(jnp.asarray(remap[0, 0]), VARCHAR, new_dict, None)
        if lc is None:
            codes = jnp.asarray(remap[0])[rc]
        elif rc is None:
            codes = jnp.asarray(remap[:, 0])[lc]
        else:
            codes = jnp.asarray(remap)[lc, rc]
        v = and_valid(lt.valid, rt.valid)
        return Typed(codes, VARCHAR, new_dict, v)

    def _observed_pairs(self, lt, rt, ld, rd, lc, rc):
        """Dictionary entries only for code pairs that actually occur."""
        lcn = np.asarray(lc).astype(np.int64)
        rcn = np.asarray(rc).astype(np.int64)
        pair = lcn * len(rd) + rcn
        upairs, inverse = np.unique(pair, return_inverse=True)
        if len(upairs) > self.MAX_DICT:
            raise ExpressionError(
                f"concat produces {len(upairs)} distinct strings "
                f"(budget {self.MAX_DICT})")
        entries = np.array(
            [ld[int(p) // len(rd)] + rd[int(p) % len(rd)] for p in upairs],
            dtype="S")
        new_dict, remap = np.unique(entries, return_inverse=True)
        codes = jnp.asarray(remap.astype(np.int32))[
            jnp.asarray(inverse.astype(np.int32))]
        return Typed(codes, VARCHAR, new_dict, and_valid(lt.valid, rt.valid))

    @classmethod
    def _as_literal_or_col(cls, t: Typed):
        if t.dtype.id == TypeId.VARCHAR and t.dictionary is not None:
            return _dict_strs(t.dictionary), t.array
        if t.dtype.id == TypeId.CHAR1:
            return [chr(b) for b in range(256)], t.array.astype(jnp.int32)
        # literal: Lit("x") evaluates to a host string scalar
        if isinstance(getattr(t, "array", None), str):
            return [t.array], None
        raise AssertionError("concat needs varchar/char operands")


@dataclasses.dataclass(eq=False)
class MathFn(Expr):
    """sqrt/abs/floor/ceil/round/exp/ln/log*/trig/power — scalar math."""
    op: str
    child: Expr
    digits: int = 0
    other: Expr | None = None   # power(x, y)'s second operand

    _UNARY = {"exp": jnp.exp, "ln": jnp.log, "log": jnp.log10,
              "log2": jnp.log2, "log10": jnp.log10, "sin": jnp.sin,
              "cos": jnp.cos, "tan": jnp.tan}

    def eval(self, ctx):
        t = self.child.eval(ctx)
        if self.op == "abs":
            if t.dtype.id in (TypeId.INT32, TypeId.INT64, TypeId.DECIMAL):
                return Typed(jnp.abs(t.array), t.dtype, None, t.valid)
            return Typed(jnp.abs(_as_double(t)), DOUBLE, None, t.valid)
        x = _as_double(t)
        if self.op in self._UNARY:
            return Typed(self._UNARY[self.op](x), DOUBLE, None, t.valid)
        if self.op == "power":
            o = self.other.eval(ctx)
            return Typed(jnp.power(x, _as_double(o)), DOUBLE, None,
                         and_valid(t.valid, o.valid))
        if self.op == "sqrt":
            return Typed(jnp.sqrt(x), DOUBLE, None, t.valid)
        if self.op == "floor":
            return Typed(jnp.floor(x), DOUBLE, None, t.valid)
        if self.op == "ceil":
            return Typed(jnp.ceil(x), DOUBLE, None, t.valid)
        if self.op == "round":
            # decimal stays exact: rescale in int64 with half-up rounding
            if t.dtype.id == TypeId.DECIMAL and self.digits <= t.dtype.scale:
                drop = t.dtype.scale - self.digits
                if drop == 0:
                    return t
                p = jnp.int64(10 ** drop)
                a = t.array
                half = jnp.where(a >= 0, p // 2, -(p // 2))
                out = jnp.floor_divide(a + half, p)
                return Typed(out, DataType(TypeId.DECIMAL, self.digits),
                             None, t.valid)
            f = 10.0 ** self.digits
            return Typed(jnp.round(x * f) / f, DOUBLE, None, t.valid)
        raise ValueError(self.op)
