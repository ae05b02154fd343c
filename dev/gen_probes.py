#!/usr/bin/env python3
"""Deterministic random-expression probe generator (r10).

Builds depth-bounded scalar expressions over the orders fixture from a
whitelist of constructs both engines should agree on, and emits one
probe line per expression. Run the output through DiffProbe + the duck
twin like any hand-written batch; every diff is a divergence to triage.

Usage: python3 dev/gen_probes.py [n] [seed] > dev/diff_probe_gen.txt
"""
import random
import sys

INT = "int"
DBL = "dbl"
STR = "str"
DATE = "date"
BOOL = "bool"

COLS = [("o_orderkey", INT), ("o_custkey", INT), ("o_totalprice", DBL),
        ("o_orderstatus", STR), ("o_orderpriority", STR),
        ("o_orderdate", DATE)]


def lit(rng, ty):
    if ty == INT:
        return str(rng.choice([0, 1, 2, 3, 5, 7, 10, 100, -1, -3]))
    if ty == DBL:
        return str(rng.choice([0.5, 1.5, 2.0, -0.5, 10.25, 3.0]))
    if ty == STR:
        return "'" + rng.choice(["a", "ab", "xyz", "O", "-", " ", "1"]) + "'"
    if ty == DATE:
        return "DATE '" + rng.choice(
            ["2024-03-07", "1997-01-31", "2000-12-25"]) + "'"
    return rng.choice(["true", "false"])


def atom(rng, ty):
    cols = [c for c, t in COLS if t == ty]
    if cols and rng.random() < 0.6:
        c = rng.choice(cols)
        # the fixture's o_orderdate is TIMESTAMP-typed — cast to DATE so
        # date + int arithmetic is valid on both engines
        return c + "::DATE" if ty == DATE else c
    return lit(rng, ty)


def gen(rng, ty, depth):
    if depth <= 0:
        return atom(rng, ty)
    r = rng.random()
    if ty == INT:
        if r < 0.25:
            a, b = gen(rng, INT, depth - 1), gen(rng, INT, depth - 1)
            op = rng.choice(["+", "-", "*"])
            return f"({a} {op} {b})"
        if r < 0.35:
            # divisor pinned non-zero
            return f"({gen(rng, INT, depth - 1)} % {rng.choice([2, 3, 5, 7])})"
        if r < 0.45:
            return f"({gen(rng, INT, depth - 1)} // {rng.choice([2, 3, 5])})"
        if r < 0.55:
            return f"abs({gen(rng, INT, depth - 1)})"
        if r < 0.65:
            return f"length({gen(rng, STR, depth - 1)})"
        if r < 0.75:
            f = rng.choice(["year", "month", "day", "dayofweek", "isodow",
                            "quarter", "week"])
            return f"{f}({gen(rng, DATE, depth - 1)})"
        if r < 0.8:
            return f"greatest({gen(rng, INT, depth - 1)}, {gen(rng, INT, depth - 1)})"
        if r < 0.85:
            return f"coalesce(nullif({gen(rng, INT, depth - 1)}, {lit(rng, INT)}), {lit(rng, INT)})"
        if r < 0.9:
            return f"instr({gen(rng, STR, depth - 1)}, {lit(rng, STR)})"
        if r < 0.95:
            return (f"date_diff('day', {gen(rng, DATE, depth - 1)}, "
                    f"{gen(rng, DATE, depth - 1)})")
        return (f"(CASE WHEN {gen(rng, BOOL, depth - 1)} THEN "
                f"{gen(rng, INT, depth - 1)} ELSE {gen(rng, INT, depth - 1)} END)")
    if ty == DBL:
        if r < 0.3:
            a = gen(rng, DBL, depth - 1)
            # keep the second factor a literal: column*column magnitudes
            # (~1e11) cannot represent 4 decimals and expose cross-engine
            # rounding ulps at the canonical print precision
            op = rng.choice(['+', '-', '*'])
            b = lit(rng, DBL) if op == '*' else gen(rng, DBL, depth - 1)
            return f"({a} {op} {b})"
        if r < 0.45:
            return f"round({gen(rng, DBL, depth - 1)}, {rng.choice([0, 1, 2, 3])})"
        if r < 0.55:
            return f"abs({gen(rng, DBL, depth - 1)})"
        if r < 0.65:
            return f"floor({gen(rng, DBL, depth - 1)})"
        if r < 0.75:
            return f"ceil({gen(rng, DBL, depth - 1)})"
        if r < 0.85:
            return f"sqrt(abs({gen(rng, DBL, depth - 1)}))"
        return f"(CAST({gen(rng, INT, depth - 1)} AS DOUBLE) / {rng.choice([2, 4, 8])})"
    if ty == STR:
        if r < 0.25:
            return f"({gen(rng, STR, depth - 1)} || {gen(rng, STR, depth - 1)})"
        if r < 0.4:
            return f"upper({gen(rng, STR, depth - 1)})"
        if r < 0.5:
            return f"lower({gen(rng, STR, depth - 1)})"
        if r < 0.6:
            return f"substr({gen(rng, STR, depth - 1)}, {rng.choice([1, 2, -1])}, {rng.choice([1, 2, 3])})"
        if r < 0.7:
            return f"reverse({gen(rng, STR, depth - 1)})"
        if r < 0.8:
            return f"trim({gen(rng, STR, depth - 1)})"
        if r < 0.85:
            return f"replace({gen(rng, STR, depth - 1)}, 'a', 'z')"
        if r < 0.9:
            return f"lpad({gen(rng, STR, depth - 1)}, {rng.choice([3, 5])}, '_')"
        if r < 0.95:
            return f"coalesce(nullif({gen(rng, STR, depth - 1)}, {lit(rng, STR)}), {lit(rng, STR)})"
        return f"left({gen(rng, STR, depth - 1)}, {rng.choice([1, 2, 10])})"
    if ty == DATE:
        if r < 0.4:
            return f"({gen(rng, DATE, depth - 1)} + {rng.choice([1, 7, 30, -3])})"
        if r < 0.6:
            return f"last_day({gen(rng, DATE, depth - 1)})"
        return atom(rng, DATE)
    # bool
    if r < 0.4:
        a, b = gen(rng, INT, depth - 1), gen(rng, INT, depth - 1)
        return f"({a} {rng.choice(['<', '<=', '=', '<>', '>='])} {b})"
    if r < 0.6:
        a, b = gen(rng, STR, depth - 1), gen(rng, STR, depth - 1)
        return f"({a} {rng.choice(['<', '=', '>'])} {b})"
    if r < 0.7:
        return f"({gen(rng, BOOL, depth - 1)} AND {gen(rng, BOOL, depth - 1)})"
    if r < 0.8:
        return (f"({gen(rng, INT, depth - 1)} BETWEEN "
                f"{lit(rng, INT)} AND {lit(rng, INT)})")
    if r < 0.9:
        return f"({gen(rng, STR, depth - 1)} IN ('a', 'O', 'xyz'))"
    return f"(NOT {gen(rng, BOOL, depth - 1)})"


"""Query-level mode: random join/group-by/having shapes over the TPC-H
fixture pair graph. Aggregate doubles are rounded (sum magnitudes would
otherwise expose accumulation-order ulps — the engines sum in different
orders, which is correct behavior on both sides)."""

JOINS = [
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
]
GROUPABLE = {
    "orders": ["o_orderstatus", "o_orderpriority"],
    "customer": ["c_mktsegment", "c_nationkey"],
    "lineitem": ["l_returnflag", "l_linestatus"],
    "nation": ["n_name", "n_regionkey"],
}
NUMERIC = {
    "orders": ["o_totalprice", "o_orderkey"],
    "customer": ["c_acctbal", "c_custkey"],
    "lineitem": ["l_quantity", "l_extendedprice"],
    "nation": ["n_nationkey"],
}
PREDCOL = {
    "orders": "o_orderkey", "customer": "c_custkey",
    "lineitem": "l_orderkey", "nation": "n_nationkey",
}


# lineitem's l_orderkey repeats per line — the composite keeps window
# tiebreaks and ORDER BYs deterministic
PK = {"orders": "o_orderkey", "customer": "c_custkey",
      "lineitem": "(l_orderkey * 8 + l_linenumber)",
      "nation": "n_nationkey"}


def gen_window_query(rng):
    t1 = rng.choice(["orders", "customer", "lineitem"])
    key = rng.choice(GROUPABLE[t1])
    num = rng.choice(NUMERIC[t1])
    pk = PK[t1]
    # the synthetic lineitem has NO unique key (14k duplicate
    # (l_orderkey, l_linenumber) pairs at sf0.01) — running sums and lag
    # are tie-order nondeterministic there, so those shapes only run on
    # unique-pk tables; rank/row_number/count produce the same output
    # MULTISET under any tie order and stay available everywhere
    order_sensitive = t1 != "lineitem"
    fns = [
        f"row_number() OVER (PARTITION BY {key} ORDER BY {num}, {pk})",
        f"rank() OVER (PARTITION BY {key} ORDER BY {num} DESC, {pk})",
        f"dense_rank() OVER (ORDER BY {key}, {pk})",
        f"count(*) OVER (PARTITION BY {key})",
    ]
    if order_sensitive:
        fns += [
            f"CAST(round(sum({num}) OVER (PARTITION BY {key} ORDER BY {pk} "
            f"ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 10.0) AS BIGINT)",
            f"lag(CAST({key} AS VARCHAR), 1, 'zz') OVER (ORDER BY {pk})",
        ]
    fn = rng.choice(fns)
    pred = f"{pk} % {rng.choice([2, 3])} = 0 AND {pk} < {rng.choice([200, 500])}"
    return (f"SELECT {pk}, {key}, {fn} AS w FROM {t1} WHERE {pred} "
            f"ORDER BY {pk}" + (", 2, 3" if t1 == "lineitem" else ""))


def gen_exists_query(rng):
    t1, t2, k1, k2 = rng.choice(JOINS)
    form = rng.choice(["EXISTS", "NOT EXISTS", "NOT IN"])
    pk = PK[t1]
    if form == "NOT IN":
        sub = f"{k1} NOT IN (SELECT {k2} FROM {t2} WHERE {PK[t2]} % 2 = 0)"
    else:
        sub = (f"{form} (SELECT 1 FROM {t2} WHERE {k2} = {k1} "
               f"AND {PK[t2]} % 2 = 0)")
    return (f"SELECT {pk}, {rng.choice(GROUPABLE[t1])} AS g FROM {t1} "
            f"WHERE {sub} AND {pk} < 300 ORDER BY {pk}"
            + (", 2" if t1 == "lineitem" else ""))


def gen_setop_query(rng):
    t1 = rng.choice(["orders", "customer"])
    key = rng.choice(GROUPABLE[t1])
    pk = PK[t1]
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    return (f"SELECT {key} AS k FROM {t1} WHERE {pk} % 2 = 0 AND {pk} < 400 "
            f"{op} SELECT {key} FROM {t1} WHERE {pk} % 3 = 0 AND {pk} < 400 "
            f"ORDER BY k")


def gen_query(rng):
    r = rng.random()
    if r < 0.25:
        return gen_window_query(rng)
    if r < 0.4:
        return gen_exists_query(rng)
    if r < 0.5:
        return gen_setop_query(rng)
    t1, t2, k1, k2 = rng.choice(JOINS)
    jt = rng.choice(["JOIN", "LEFT JOIN", "SEMI-SUB"])
    keys = [rng.choice(GROUPABLE[t1])]
    if rng.random() < 0.5:
        keys.append(rng.choice(GROUPABLE[t2] if jt != "SEMI-SUB" else GROUPABLE[t1]))
    keys = list(dict.fromkeys(keys))
    num = rng.choice(NUMERIC[t1])
    aggs = [f"count(*) AS n",
            f"CAST(round(sum({num}) / 100.0) AS BIGINT) AS s"]
    if rng.random() < 0.5:
        aggs.append(f"CAST(min({num}) AS BIGINT) AS mn")
    if rng.random() < 0.4:
        aggs.append(f"count(DISTINCT {rng.choice(GROUPABLE[t1])}) AS cd")
    pred = f"{PREDCOL[t1]} % {rng.choice([2, 3, 5])} = 0 AND {PREDCOL[t1]} < {rng.choice([500, 2000, 10000])}"
    if jt == "SEMI-SUB":
        frm = (f"FROM {t1} WHERE {k1} IN (SELECT {k2} FROM {t2}) "
               f"AND {pred}")
    else:
        frm = f"FROM {t1} {jt} {t2} ON {k1} = {k2} WHERE {pred}"
    having = ""
    if rng.random() < 0.4:
        having = f" HAVING count(*) > {rng.choice([1, 3, 10])}"
    sel = ", ".join(keys + aggs)
    return (f"SELECT {sel} {frm} GROUP BY {', '.join(keys)}{having} "
            f"ORDER BY {', '.join(keys)}")


"""List mode (r11): depth-bounded expressions over the LIST surface —
literals (incl. NULL elements and []), lambdas (1- and 2-param),
sort/distinct/filter/slice/concat/aggregate/subscript — the function
family where NULL-element and empty-list semantics diverge silently."""

LI = "li"   # LIST of INT
LS = "ls"   # LIST of STR


def lit_list(rng, ty):
    if ty == LI:
        opts = ["[1, 2, 3]", "[5, 1, 5, NULL]", "[7]", "[]",
                "[-2, 0, 2, 4]", "[NULL]", "[3, 1, 2, 1]"]
    else:
        opts = ["['a', 'bb', 'c']", "['z', NULL, 'a']", "['x']",
                "['q', 'q', 'r']"]
    return rng.choice(opts)


def gen_list(rng, ty, depth):
    if ty in (LI, LS):
        if depth <= 0:
            if ty == LI and rng.random() < 0.3:
                return f"[o_orderkey % 7, o_orderkey % 5 - 1, {rng.choice([3, 9])}]"
            if ty == LS and rng.random() < 0.3:
                return "string_split(o_orderpriority, '-')"
            return lit_list(rng, ty)
        r = rng.random()
        el = "x + 1" if ty == LI else "upper(x)"
        pred = "x % 2 = 0" if ty == LI else "length(x) >= 2"
        if r < 0.15:
            return f"list_sort({gen_list(rng, ty, depth - 1)})"
        if r < 0.25:
            return f"list_reverse_sort({gen_list(rng, ty, depth - 1)})"
        if r < 0.35:
            # duck's list_distinct output ORDER is unspecified (hash-based;
            # known adjudication) — sort so the probe pins the dedup/NULL-
            # drop semantics, not the arbitrary order
            return f"list_sort(list_distinct({gen_list(rng, ty, depth - 1)}))"
        if r < 0.5:
            return f"list_transform({gen_list(rng, ty, depth - 1)}, x -> {el})"
        if r < 0.6:
            return f"list_filter({gen_list(rng, ty, depth - 1)}, x -> {pred})"
        if r < 0.7:
            return (f"list_concat({gen_list(rng, ty, depth - 1)}, "
                    f"{gen_list(rng, ty, depth - 1)})")
        if r < 0.8:
            a = rng.choice([1, 2, -1])
            return f"list_slice({gen_list(rng, ty, depth - 1)}, {a}, {a + rng.choice([0, 1, 2])})"
        if r < 0.9 and ty == LI:
            return (f"list_transform({gen_list(rng, LI, depth - 1)}, "
                    f"(x, i) -> x + i * {rng.choice([1, 10])})")
        return f"list_append({gen_list(rng, ty, depth - 1)}, {'9' if ty == LI else chr(39) + 'w' + chr(39)})"
    # scalar reductions over lists
    r = rng.random()
    src = gen_list(rng, rng.choice([LI, LS]), depth - 1)
    isrc = gen_list(rng, LI, depth - 1)
    if r < 0.2:
        return f"len({src})"
    if r < 0.35:
        return f"list_sum({isrc})"
    if r < 0.5:
        return f"list_aggregate({isrc}, '{rng.choice(['min', 'max', 'sum'])}')"
    if r < 0.65:
        return f"list_position({isrc}, {rng.choice([1, 2, 5, 'NULL'])})"
    if r < 0.8:
        return f"({isrc})[{rng.choice([1, 2, 5, -1])}]"
    if r < 0.9:
        return f"CAST(list_contains({isrc}, {rng.choice([1, 5, 9])}) AS VARCHAR)"
    return f"array_to_string({gen_list(rng, LS, depth - 1)}, ',')"


def gen_list_probe(rng):
    if rng.random() < 0.55:
        e = gen_list(rng, rng.choice([LI, LS]), rng.choice([1, 2, 3]))
    else:
        e = gen_list(rng, "scalar", rng.choice([2, 3]))
    return (f"SELECT o_orderkey, {e} AS e FROM orders "
            "WHERE o_orderkey < 25 ORDER BY o_orderkey")


"""Map/struct mode (r11): MAP {…} literals, map_from_entries, keys/
values/cardinality, the LIST-shaped duck map subscript, element_at/
map_extract, map_concat, struct_pack + dot access — the container
surface where key order, duplicate keys, and missing-key shapes can
silently diverge."""


def gen_map_atom(rng):
    opts = [
        "MAP {'a': 1, 'b': 2}",
        "MAP {'x': 10, 'y': NULL, 'z': 30}",
        "MAP {'k': o_orderkey % 5, 'j': 3}",
        "MAP {'one': 'I', 'two': 'II'}",
        "map_from_entries([('a', 1), ('b', o_orderkey % 3)])",
    ]
    return rng.choice(opts)


def gen_map_probe(rng):
    m = gen_map_atom(rng)
    r = rng.random()
    if r < 0.12:
        e = f"map_keys({m})"
    elif r < 0.24:
        e = f"map_values({m})"
    elif r < 0.34:
        e = f"cardinality({m})"
    elif r < 0.46:
        k = rng.choice(["'a'", "'x'", "'k'", "'nope'", "'two'"])
        e = f"({m})[{k}]"
    elif r < 0.58:
        k = rng.choice(["'a'", "'y'", "'j'", "'nope'"])
        e = f"element_at({m}, {k})"
    elif r < 0.68:
        # both sides BIGINT-valued: duck's map_concat requires identical
        # value types (INTEGER literal vs BIGINT column expr is an error)
        e = ("map_concat(MAP {'a': o_orderkey % 2, 'c': 9}, "
             "MAP {'b': o_orderkey % 4})")
    elif r < 0.8:
        f1 = rng.choice(["a", "b"])
        e = (f"(struct_pack(a := o_orderkey % 7, b := 'v' || (o_orderkey % 3)))"
             f".{f1}")
    elif r < 0.9:
        e = ("struct_pack(n := o_orderkey % 5, "
             "s := struct_pack(inner := o_orderkey % 2))")
    else:
        e = f"map_extract({m}, {rng.choice(['chr(97)', chr(39) + 'b' + chr(39)])})"
    return (f"SELECT o_orderkey, {e} AS e FROM orders "
            "WHERE o_orderkey < 25 ORDER BY o_orderkey")


"""Numeric-edge mode (r12, eighth mode): the arithmetic surface the
scalar mode's safe whitelist never stresses — bit operators, NaN/inf
propagation (via CAST('nan'/'inf' AS DOUBLE) so both engines build the
same specials), log/sqrt domain edges wrapped in abs()+1 guards (duck
ERRORS on ln(0)/sqrt(-1) — bare forms would be loud noise, probed),
negative-digit round, trunc/even, gcd/lcm/factorial(<=20; 21 overflows
to HUGEINT in duck where Spark's factorial NULLs — documented, not
generated), boundary literals at int32/2^53/int64 edges (overflow is a
loud error in BOTH engines under ANSI). Doubles round(…, 4) like the
scalar mode."""

NUM_SPECIALS = ["CAST('nan' AS DOUBLE)", "CAST('inf' AS DOUBLE)",
                "CAST('-infinity' AS DOUBLE)"]
NUM_INTS = [0, 1, 2, 7, 255, 1024, 2147483647, -2147483648,
            4503599627370496, 9007199254740993]


def gen_num(rng, kind, depth):
    """kind: 'i' integer-valued, 'd' double-valued."""
    r = rng.random()
    if depth <= 0:
        if kind == 'i':
            if rng.random() < 0.5:
                return "o_orderkey"
            return str(rng.choice(NUM_INTS))
        if rng.random() < 0.15:
            return rng.choice(NUM_SPECIALS)
        if rng.random() < 0.5:
            return "o_totalprice"
        return rng.choice(["1e308", "1e-300", "0.5e0", "-2.75e0", "1.5e300"])
    if kind == 'i':
        if r < 0.20:
            a, b = gen_num(rng, 'i', depth - 1), rng.choice([1, 2, 3, 7, 15])
            op = rng.choice(["&", "|", "<<", ">>"])
            sh = rng.choice([0, 1, 3, 7, 13]) if op in ("<<", ">>") else b
            # duck errors on shifting NEGATIVE numbers — abs() the base
            return f"(abs(({a}) % 1024) {op} {sh})" if op in ("<<", ">>") \
                else f"(({a}) {op} {b})"
        if r < 0.35:
            return f"abs(({gen_num(rng, 'i', depth - 1)}) % 100000)"
        if r < 0.45:
            return f"gcd({gen_num(rng, 'i', depth - 1)} % 1000, {rng.choice([6, 15, 28])})"
        if r < 0.50:
            return f"lcm({gen_num(rng, 'i', depth - 1)} % 50, {rng.choice([4, 9])})"
        if r < 0.58:
            return (f"factorial(CAST(abs({gen_num(rng, 'i', depth - 1)}) "
                    f"% {rng.choice([10, 21])} AS INTEGER))")
        if r < 0.68:
            return f"bit_count(CAST(({gen_num(rng, 'i', depth - 1)}) % 100000 AS BIGINT))"
        if r < 0.78:
            return f"sign({gen_num(rng, 'd', depth - 1)})"
        if r < 0.88:
            return f"(({gen_num(rng, 'i', depth - 1)}) // {rng.choice([3, 7, 100])})"
        return f"(({gen_num(rng, 'i', depth - 1)}) % {rng.choice([97, 1000])})"
    # double-valued
    if r < 0.18:
        a = gen_num(rng, 'd', depth - 1)
        op = rng.choice(['+', '-', '*'])
        # '*' keeps a literal factor (scalar-mode precedent: column*column
        # magnitudes can't represent 4 decimals — cross-engine round() of
        # the same double differs in the last printed digit)
        b = rng.choice(["2e0", "0.5e0", "-3e0"]) if op == '*'             else rng.choice(["2e0", "0.5e0", "-3e0",
                             gen_num(rng, 'd', depth - 1)])
        return f"({a} {op} {b})"
    if r < 0.28:
        return f"round({gen_num(rng, 'd', depth - 1)}, {rng.choice([-2, -1, 0, 2, 4])})"
    if r < 0.36:
        return f"trunc({gen_num(rng, 'd', depth - 1)})"
    if r < 0.42:
        return f"even({gen_num(rng, 'd', depth - 1)})"
    if r < 0.50:
        return f"ln(abs({gen_num(rng, 'd', depth - 1)}) + 1)"
    if r < 0.56:
        return f"log10(abs({gen_num(rng, 'd', depth - 1)}) + 1)"
    if r < 0.64:
        return f"sqrt(abs({gen_num(rng, 'd', depth - 1)}))"
    if r < 0.70:
        return f"cbrt({gen_num(rng, 'd', depth - 1)})"
    if r < 0.76:
        # exponent 2 squares ~1e5-magnitude columns past 4-decimal double
        # precision (the '*' literal-factor rule's rationale)
        return f"power({gen_num(rng, 'd', depth - 1)}, {rng.choice([0, 1, -1])})"
    if r < 0.82:
        return f"atan2({gen_num(rng, 'd', depth - 1)}, {rng.choice(['1e0', '-1e0', '0e0'])})"
    if r < 0.90:
        f = rng.choice(["greatest", "least"])
        return f"{f}({gen_num(rng, 'd', depth - 1)}, {gen_num(rng, 'd', depth - 1)})"
    return f"exp(least({gen_num(rng, 'd', depth - 1)}, 700e0))"


"""DECIMAL/HUGEINT mode (r13, ninth mode — VERDICT r12 #1): the exact-
arithmetic surface the num mode's double-centric generator never
stresses — decimal literals/casts at p/s boundaries, DECIMAL→DECIMAL
downscale casts (duck TRUNCATES where Spark rounds HALF_UP — probed),
greatest/least over decimals (duck converts to DOUBLE incl. its
precision loss; HUGEINT stays exact), // and % over DECIMAL vs HUGEINT
operands (duck's // is plain double division for DECIMAL pairs but
exact INT128 trunc division for HUGEINT pairs — the HUGEINT→
DECIMAL(38,0) type mapping must not erase that), round/trunc/floor/
ceil result types, decimal aggregation (sum exact, avg → DOUBLE),
>2⁶³ arithmetic through HUGEINT casts and bare >19-digit literals.
Magnitude classes keep Spark's DECIMAL(38) precision-loss cap and
duck's out-of-range errors out of reach (overflow is loud on BOTH
sides with unmatchable messages — not a divergence, just noise).
Division outputs serialize through round(…, 4); VARCHAR rendering is
pinned only on scale-stable shapes (cast/round/trunc/abs)."""

DEC_LITS = ["1.25", "-3.105", "0.07", "12345.6789", "0.5", "2.555",
            "-0.125", "99999999.99"]
HUGE_ATOMS = [
    "CAST('99999999999999999999' AS HUGEINT)",
    "CAST('-170141183460469231731687303715' AS HUGEINT)",
    "CAST('4611686018427387904' AS HUGEINT)",
    "99999999999999999999999",     # bare 23-digit literal: HUGEINT in duck
    "CAST(o_orderkey AS HUGEINT)",
]


def gen_dec(rng, depth):
    """A DECIMAL-valued expression of bounded magnitude (< ~1e9)."""
    if depth <= 0:
        r = rng.random()
        if r < 0.35:
            return f"CAST(o_totalprice AS DECIMAL({rng.choice(['18,2', '38,6', '12,0'])}))"
        if r < 0.5:
            return f"CAST(o_orderkey AS DECIMAL(10,0))"
        if r < 0.9:
            return rng.choice(DEC_LITS)
        return f"CAST('{rng.choice(['1.255', '-1.256', '0.004999', '7'])}' AS DECIMAL(8,3))"
    r = rng.random()
    if r < 0.20:
        op = rng.choice(["+", "-"])
        return f"({gen_dec(rng, depth - 1)} {op} {gen_dec(rng, depth - 1)})"
    if r < 0.28:
        # literal second factor: keeps precision under Spark's 38-cap
        # (precision loss rounds there where duck errors — both avoided)
        return f"({gen_dec(rng, depth - 1)} * {rng.choice(['2', '-3', '0.5', '1.5'])})"
    if r < 0.36:
        return f"({gen_dec(rng, depth - 1)} % {rng.choice(['7', '2.5', '97'])})"
    if r < 0.42:
        s = rng.choice([0, 1, 2, 3])
        return f"CAST({gen_dec(rng, depth - 1)} AS DECIMAL(38,{s}))"
    if r < 0.48:
        return f"TRY_CAST({gen_dec(rng, depth - 1)} AS DECIMAL(6,2))"
    if r < 0.56:
        return f"round({gen_dec(rng, depth - 1)}, {rng.choice([-2, -1, 0, 1, 2])})"
    if r < 0.64:
        f = rng.choice(["trunc", "floor", "ceil"])
        return f"{f}({gen_dec(rng, depth - 1)})"
    if r < 0.72:
        return f"abs({gen_dec(rng, depth - 1)})"
    if r < 0.78:
        return f"(- {gen_dec(rng, depth - 1)})"
    if r < 0.86:
        f = rng.choice(["greatest", "least"])
        return f"{f}({gen_dec(rng, depth - 1)}, {gen_dec(rng, depth - 1)})"
    if r < 0.93:
        return (f"coalesce(nullif({gen_dec(rng, depth - 1)}, "
                f"{rng.choice(DEC_LITS)}), {rng.choice(DEC_LITS)})")
    return (f"(CASE WHEN o_orderkey % {rng.choice([2, 3])} = 0 THEN "
            f"{gen_dec(rng, depth - 1)} ELSE {gen_dec(rng, depth - 1)} END)")


def gen_huge(rng, depth):
    """A HUGEINT-valued expression (magnitudes kept under ~1e35)."""
    if depth <= 0:
        return rng.choice(HUGE_ATOMS)
    r = rng.random()
    if r < 0.25:
        op = rng.choice(["+", "-"])
        return f"({gen_huge(rng, depth - 1)} {op} {rng.choice(['1', '999', '1000000007'])})"
    if r < 0.35:
        return f"({gen_huge(rng, depth - 1)} * {rng.choice(['2', '-3', '7'])})"
    if r < 0.50:
        return f"({gen_huge(rng, depth - 1)} % {rng.choice(['97', '1000000007', '7'])})"
    if r < 0.65:
        return f"({gen_huge(rng, depth - 1)} // {rng.choice(['3', '1000000007', '-7'])})"
    if r < 0.75:
        return f"abs({gen_huge(rng, depth - 1)})"
    if r < 0.82:
        return f"(- {gen_huge(rng, depth - 1)})"
    if r < 0.92:
        f = rng.choice(["greatest", "least"])
        return f"{f}({gen_huge(rng, depth - 1)}, {gen_huge(rng, depth - 1)})"
    return (f"(CASE WHEN o_orderkey % 2 = 0 THEN {gen_huge(rng, depth - 1)} "
            f"ELSE {gen_huge(rng, depth - 1)} END)")


def gen_dec_probe(rng):
    r = rng.random()
    if r < 0.12:
        # aggregate shape: sum exact, avg → duck DOUBLE vs Spark DECIMAL
        e = gen_dec(rng, 1)
        return (f"SELECT o_orderstatus, count(*) AS n, sum({e}) AS s, "
                f"min({e}) AS mn, max({e}) AS mx, round(avg({e}), 3) AS av "
                f"FROM orders WHERE o_orderkey < 500 "
                f"GROUP BY o_orderstatus ORDER BY o_orderstatus")
    if r < 0.17:
        # window avg over decimals: the sum/count split must replicate
        # the OVER suffix on both halves
        e = gen_dec(rng, 1)
        return (f"SELECT o_orderkey, round(avg({e}) OVER "
                f"(PARTITION BY o_orderstatus), 3) AS w FROM orders "
                f"WHERE o_orderkey < 60 ORDER BY o_orderkey")
    if r < 0.22:
        # double → HUGEINT cast rounds half-EVEN (int-round dispatch);
        # decimal → HUGEINT rounds half-away; plus hugeint / (duck:
        # DOUBLE division even for hugeints)
        k = rng.random()
        if k < 0.4:
            v = rng.choice(["2.5", "3.5", "-2.5", "0.145", "2.675"])
            return (f"SELECT o_orderkey, CAST(CAST({v} AS DOUBLE) AS HUGEINT) AS a, "
                    f"CAST({v} AS HUGEINT) AS b FROM orders "
                    f"WHERE o_orderkey < 4 ORDER BY o_orderkey")
        return (f"SELECT o_orderkey, round({gen_huge(rng, 1)} / "
                f"{rng.choice(['7', '1000000007'])}, 4) AS q FROM orders "
                f"WHERE o_orderkey < 4 ORDER BY o_orderkey")
    outs = []
    for _ in range(rng.choice([2, 3])):
        k = rng.random()
        if k < 0.4:
            e = gen_dec(rng, rng.choice([1, 2]))
            kk = rng.random()
            if kk < 0.3:
                outs.append(e)  # decimal rendering itself
            elif kk < 0.5:
                outs.append(f"round({e}, 4)")
            elif kk < 0.65:
                # scale-stable shapes only: division never reaches here
                outs.append(f"CAST(round({e}, 2) AS VARCHAR)")
            elif kk < 0.8:
                outs.append(f"CAST({e} AS BIGINT)")
            else:
                outs.append(f"({e} {rng.choice(['<', '<=', '>', '='])} "
                            f"{gen_dec(rng, 1)})")
        elif k < 0.6:
            # division: duck DOUBLE vs Spark DECIMAL — serialize rounded
            a, b = gen_dec(rng, 1), rng.choice(["7", "2.5", "-3", "0.25"])
            if rng.random() < 0.5:
                outs.append(f"round({a} / {b}, 4)")
            else:
                outs.append(f"round({a} // {b}, 4)")
        else:
            e = gen_huge(rng, rng.choice([1, 2]))
            kk = rng.random()
            if kk < 0.45:
                outs.append(e)  # exact integral rendering
            elif kk < 0.6:
                outs.append(f"CAST({e} AS VARCHAR)")
            elif kk < 0.7:
                outs.append(f"TRY_CAST({e} AS BIGINT)")
            elif kk < 0.8:
                outs.append(f"sign({e})")
            else:
                outs.append(f"({e} {rng.choice(['<', '>', '='])} "
                            f"{gen_huge(rng, 1)})")
    sel = ", ".join(f"{o} AS c{i}" for i, o in enumerate(outs))
    return (f"SELECT o_orderkey, {sel} FROM orders "
            f"WHERE o_orderkey < 10 ORDER BY o_orderkey")


def gen_num_probe(rng):
    outs = []
    for _ in range(rng.choice([2, 3])):
        kind = rng.choice(['i', 'd', 'b'])
        if kind == 'b':
            k = rng.random()
            if k < 0.4:
                outs.append(f"isnan({gen_num(rng, 'd', 1)})")
            elif k < 0.7:
                outs.append(f"isinf({gen_num(rng, 'd', 1)})")
            else:
                outs.append(f"({gen_num(rng, 'd', 1)} "
                            f"{rng.choice(['<', '<=', '>', '='])} {gen_num(rng, 'd', 1)})")
        elif kind == 'i':
            outs.append(f"CAST({gen_num(rng, 'i', rng.choice([1, 2]))} AS BIGINT)")
        else:
            outs.append(f"round({gen_num(rng, 'd', rng.choice([1, 2]))}, 4)")
    sel = ", ".join(f"{o} AS c{i}" for i, o in enumerate(outs))
    return (f"SELECT o_orderkey, {sel} FROM orders "
            f"WHERE o_orderkey < 6 ORDER BY o_orderkey")


"""Timestamp/timezone mode (r12, VERDICT r11 #5): the biggest unfuzzed
surface — to_timestamp edge parses, AT TIME ZONE / timezone()
compositions, epoch boundaries (negative epochs, fractional seconds),
DST-crossing zone math over IANA zones incl. a half-hour offset,
make_timestamp fractional edges, strptime/strftime round-trips, and
timestamp interval arithmetic. Interval OUTPUTS are always serialized
through extract(epoch FROM …) or date_diff (raw INTERVAL rendering is a
known cross-engine rendering class); year-9999 overflow edges are
excluded (duck wraps to a '10000-…' STRING where Spark errors — loud
either way)."""

TS_LITS = [
    "2024-03-10 06:30:00",        # US DST spring-forward day
    "2024-11-03 05:30:00",        # US DST fall-back day
    "1969-12-31 23:59:59.25",     # negative fractional epoch
    "2000-02-29 12:00:00",        # century leap day
    "2024-01-31 12:00:00",        # month-end clamp source
    "1997-05-28 03:04:05.123456", # full micros
    "2038-01-19 03:14:07",        # 32-bit epoch boundary
]
TS_ZONES = ["UTC", "America/New_York", "Asia/Tokyo", "Europe/Berlin",
            "Australia/Adelaide"]  # Adelaide: +9:30 half-hour offset
TS_CAST_STRS = [
    "2024-3-5 1:2:3",            # unpadded fields
    "2024-03-05T10:00:00",       # ISO T separator
    "2024-03-05",                # date-only
    "2024-02-30 10:00:00",       # invalid day → NULL via TRY_CAST
    "2024-03-05 10:00:00.5",     # fractional
    "not a timestamp",
]
TS_FMTS = ["%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S.%f", "%d/%m/%Y %H:%M",
           "%Y-%m-%d %H:%M:%S.%g"]


def gen_ts(rng, depth):
    """A timestamp-valued expression."""
    r = rng.random()
    if depth <= 0 or r < 0.30:
        if rng.random() < 0.3:
            return "ts"  # events.ts column (TIMESTAMP)
        return f"TIMESTAMP '{rng.choice(TS_LITS)}'"
    if r < 0.40:
        z = rng.choice(TS_ZONES)
        inner = gen_ts(rng, depth - 1)
        if rng.random() < 0.5:
            return f"timezone('{z}', {inner})"
        return f"({inner} AT TIME ZONE '{z}')"
    if r < 0.50:
        ep = rng.choice([0, -1, 86400, -0.75, 1700000000.25, 951782400])
        return f"to_timestamp({ep})"
    if r < 0.60:
        frac = rng.choice(["0.0", "59.999999", "0.5", "30.25", "59.5"])
        y, m, d = rng.choice([(2024, 2, 29), (1969, 12, 31), (2001, 9, 9),
                              (2024, 1, 31)])
        return f"make_timestamp({y}, {m}, {d}, {rng.choice([0, 12, 23])}, {rng.choice([0, 59])}, {frac})"
    if r < 0.65:
        return f"make_timestamp({rng.choice([0, -750000, 1700000000123456, 951782400000000])})"
    if r < 0.75:
        # duck rejects a negative bare number in INTERVAL literals —
        # spell negatives as subtraction
        n = rng.choice([1, 2, 25, 3])
        op = rng.choice(["+", "-"])
        u = rng.choice(["MICROSECOND", "MILLISECOND", "SECOND", "MINUTE",
                        "HOUR", "DAY", "MONTH"])
        return f"({gen_ts(rng, depth - 1)} {op} INTERVAL {n} {u})"
    if r < 0.80:
        return (f"({gen_ts(rng, depth - 1)} - INTERVAL "
                f"'{rng.choice(['90 minutes', '1 month 2 days', '36 hours'])}')")
    if r < 0.85:
        fmt = rng.choice(TS_FMTS[:2])
        return f"strptime(strftime({gen_ts(rng, depth - 1)}, '{fmt}'), '{fmt}')"
    if r < 0.90:
        return f"TRY_CAST('{rng.choice(TS_CAST_STRS)}' AS TIMESTAMP)"
    f = rng.choice(["greatest", "least"])
    return f"{f}({gen_ts(rng, depth - 1)}, {gen_ts(rng, depth - 1)})"


def gen_ts_probe(rng):
    """One SELECT over events serializing ts expressions comparably."""
    outs = []
    for _ in range(rng.choice([2, 3])):
        e = gen_ts(rng, rng.choice([1, 2]))
        k = rng.random()
        if k < 0.30:
            outs.append(e)  # timestamp rendering itself
        elif k < 0.45:
            f = rng.choice(["epoch", "epoch_ms", "epoch_us"])
            outs.append(f"CAST(round({f}({e})) AS BIGINT)" if f == "epoch"
                        else f"{f}({e})")
        elif k < 0.60:
            u = rng.choice(["year", "month", "day", "hour", "minute",
                            "second", "microsecond", "dayofweek", "week"])
            outs.append(f"extract({u} FROM {e})")
        elif k < 0.70:
            outs.append(f"strftime({e}, '{rng.choice(TS_FMTS)}')")
        elif k < 0.80:
            u = rng.choice(["second", "minute", "hour", "day"])
            outs.append(f"date_diff('{u}', {e}, {gen_ts(rng, 1)})")
        elif k < 0.90:
            outs.append(
                f"CAST(extract(epoch FROM ({e} - {gen_ts(rng, 1)})) AS BIGINT)")
        else:
            outs.append(f"({e} < {gen_ts(rng, 1)})")
    sel = ", ".join(f"{o} AS c{i}" for i, o in enumerate(outs))
    return (f"SELECT event_id, {sel} FROM events "
            f"WHERE event_id < 8 ORDER BY event_id")


"""Statement-level mode (r11, VERDICT r10 #4): correlated scalar
subqueries, CTE chains (incl. recursive), and nested LATERAL — the
statement surface the query mode's flat join/group shapes never
exercise."""


def gen_correlated(rng):
    t1, t2, k1, k2 = rng.choice(JOINS)
    pk = PK[t1]
    agg = rng.choice(["count(*)", f"count({PK[t2]})",
                      f"CAST(min({NUMERIC[t2][0]}) AS BIGINT)",
                      f"CAST(max({PK[t2]}) AS BIGINT)",
                      f"CAST(round(sum({NUMERIC[t2][0]}) / 10.0) AS BIGINT)"])
    sub = f"(SELECT {agg} FROM {t2} WHERE {k2} = {k1} AND {PK[t2]} % {rng.choice([2, 3])} = 0)"
    if rng.random() < 0.5:
        # SELECT-clause scalar (NULL/0 on empty group is the classic
        # cross-engine divergence spot — coalesce half the time so both
        # bare and defaulted shapes are probed)
        e = f"coalesce({sub}, -1)" if rng.random() < 0.5 else sub
        return (f"SELECT {pk}, {e} AS c FROM {t1} "
                f"WHERE {pk} < {rng.choice([150, 300])} ORDER BY {pk}"
                + (", 2" if t1 == "lineitem" else ""))
    # WHERE-clause scalar comparison
    num = rng.choice(NUMERIC[t1])
    return (f"SELECT {pk}, {rng.choice(GROUPABLE[t1])} AS g FROM {t1} "
            f"WHERE {num} > {sub} AND {pk} < 300 ORDER BY {pk}"
            + (", 2" if t1 == "lineitem" else ""))


STR_GROUP = {"o_orderstatus", "o_orderpriority", "c_mktsegment",
             "l_returnflag", "l_linestatus", "n_name"}


def gen_cte_chain(rng):
    t1, t2, k1, k2 = rng.choice(JOINS)
    pk, key, num = PK[t1], rng.choice(GROUPABLE[t1]), rng.choice(NUMERIC[t1])
    m = rng.choice([2, 3])
    a = (f"a AS (SELECT {pk} AS id, {key} AS g, {num} AS v FROM {t1} "
         f"WHERE {pk} % {m} = 0 AND {pk} < 600)")
    b = rng.choice([
        "b AS (SELECT g, count(*) AS n, CAST(round(sum(v) / 10.0) AS BIGINT) AS s FROM a GROUP BY g)",
        f"b AS (SELECT id, g, v FROM a WHERE id % {rng.choice([2, 3, 5])} <> 1)",
        "b AS (SELECT g, id, row_number() OVER (PARTITION BY g ORDER BY v, id) AS r, v FROM a)",
    ])
    if b.startswith("b AS (SELECT g, count"):
        final = "SELECT g, n, s FROM c ORDER BY g"
        # upper() only on string keys: both engines reject upper(INTEGER)
        # (ours bind-time via graft_upper's checkInputDataTypes) but with
        # unmatchable error text — the converging probe is the typed one
        c = rng.choice([
            "c AS (SELECT g, n, s FROM b WHERE n > 1)",
            "c AS (SELECT upper(g) AS g, n + 1 AS n, s FROM b)"
            if key in STR_GROUP else
            "c AS (SELECT g, n + 1 AS n, s FROM b WHERE s <> 0)",
        ])
    elif "row_number" in b:
        # r in the ORDER BY: lineitem's composite id duplicates, and a
        # tie at the 100-row harness cutoff slices differently per engine
        final = "SELECT g, id, r FROM c ORDER BY g, id, r"
        c = f"c AS (SELECT g, id, r, v FROM b WHERE r <= {rng.choice([2, 4])})"
    else:
        # full-row ORDER BY for the same cutoff-determinism reason
        final = "SELECT id, g, CAST(round(v) AS BIGINT) AS vr FROM c ORDER BY id, 2, 3"
        c = "c AS (SELECT b1.id, b1.g, b1.v FROM b b1 JOIN a ON b1.id = a.id)"
    return f"WITH {a}, {b}, {c} {final}"


def gen_recursive(rng):
    step = rng.choice([1, 2, 3])
    lim = rng.choice([10, 25, 50])
    body = (f"WITH RECURSIVE r(n) AS (SELECT {rng.choice([1, 2])} "
            f"UNION ALL SELECT n + {step} FROM r WHERE n < {lim})")
    if rng.random() < 0.5:
        return f"{body} SELECT n FROM r ORDER BY n"
    t1 = rng.choice(["orders", "customer"])
    pk, key = PK[t1], rng.choice(GROUPABLE[t1])
    return (f"{body} SELECT r.n, t.{key} AS g FROM r JOIN {t1} t "
            f"ON t.{pk} = r.n ORDER BY r.n")


def gen_lateral(rng):
    t1, t2, k1, k2 = rng.choice(JOINS[:2])  # orders/customer, lineitem/orders
    pk, pk2 = PK[t1], PK[t2]
    num2 = rng.choice(NUMERIC[t2])
    inner = (f"LATERAL (SELECT {pk2} AS iid, {num2} AS x FROM {t2} "
             f"WHERE {k2} = {k1} ORDER BY {num2}, {pk2} "
             f"LIMIT {rng.choice([1, 2, 3])}) l")
    if rng.random() < 0.35:
        # nested: a second lateral correlated on the first's output
        outer2 = (f", LATERAL (SELECT count(*) AS c FROM {t2} "
                  f"WHERE {k2} = {k1} AND {pk2} <= l.iid) l2")
        return (f"SELECT {pk}, l.iid, CAST(round(l.x) AS BIGINT) AS xr, l2.c "
                f"FROM {t1}, {inner}{outer2} WHERE {pk} < 120 "
                f"ORDER BY {pk}, l.iid")
    agg_form = rng.random() < 0.4
    if agg_form:
        inner = (f"LATERAL (SELECT count(*) AS c, "
                 f"CAST(round(sum({num2}) / 10.0) AS BIGINT) AS s FROM {t2} "
                 f"WHERE {k2} = {k1}) l")
        return (f"SELECT {pk}, l.c, l.s FROM {t1}, {inner} "
                f"WHERE {pk} < 200 ORDER BY {pk}")
    return (f"SELECT {pk}, l.iid, CAST(round(l.x) AS BIGINT) AS xr "
            f"FROM {t1}, {inner} WHERE {pk} < 200 ORDER BY {pk}, l.iid")


def gen_stmt(rng):
    r = rng.random()
    if r < 0.35:
        return gen_correlated(rng)
    if r < 0.6:
        return gen_cte_chain(rng)
    if r < 0.75:
        return gen_recursive(rng)
    return gen_lateral(rng)


"""DML round-trip mode (r11): DROP→CTAS→INSERT→UPDATE→DELETE→SELECT as
one ';'-separated script per probe line; both harnesses execute the
whole script and compare the final SELECT. Table names are
probe-indexed so a failed probe never poisons a later one."""


def gen_dml(rng, i):
    t1, t2, k1, k2 = rng.choice(JOINS)
    pk, key, num = PK[t1], rng.choice(GROUPABLE[t1]), rng.choice(NUMERIC[t1])
    tbl = f"g_rt_{i}"
    lo, hi = rng.choice([(0, 120), (0, 200), (40, 260)])
    stmts = [
        f"DROP TABLE IF EXISTS {tbl}",
        f"CREATE TABLE {tbl} AS SELECT {pk} AS id, {key} AS g, {num} AS v "
        f"FROM {t1} WHERE {pk} >= {lo} AND {pk} < {hi}",
        f"INSERT INTO {tbl} SELECT {pk} + 100000, {key}, {num} "
        f"FROM {t1} WHERE {pk} % {rng.choice([3, 5])} = 1 AND {pk} < {hi}",
    ]
    upd = rng.random()
    if upd < 0.4:
        stmts.append(f"UPDATE {tbl} SET v = v * 2 WHERE id % {rng.choice([2, 3])} = 0")
    elif upd < 0.7:
        # lower() only on string keys (see gen_cte_chain); the correlated
        # self-subquery (pre-update snapshot semantics) is the point here
        setg = "g = lower(g), " if key in STR_GROUP else ""
        stmts.append(f"UPDATE {tbl} SET {setg}v = v + 1 "
                     f"WHERE v > (SELECT avg(v) FROM {tbl})")
    else:
        stmts.append(f"UPDATE {tbl} SET v = s.{NUMERIC[t2][0]} "
                     f"FROM {t2} s WHERE {tbl}.id = s.{PK[t2]} "
                     f"AND s.{PK[t2]} % 4 = 0")
    if rng.random() < 0.5:
        stmts.append(f"DELETE FROM {tbl} WHERE id % {rng.choice([7, 11])} = 2")
    else:
        stmts.append(f"DELETE FROM {tbl} USING {t2} s "
                     f"WHERE {tbl}.id = s.{PK[t2]} AND s.{PK[t2]} % 6 = 3")
    stmts.append(f"SELECT id, g, CAST(round(v * 100) AS BIGINT) AS v_c "
                 f"FROM {tbl} ORDER BY id, g, v_c")
    return "; ".join(stmts)


"""String/unicode mode (r14, tenth mode — VERDICT r13 #2): the largest
remaining unfuzzed surface. The r13 scout (32 hand probes) found 7
divergent cells and closed 4; this generator randomizes the same
families — multi-byte/emoji/combining-char length grids, case mapping
(Unicode vs ASCII-only paths), trim charsets, pad/repeat/substr index
edges, split_part/string_split, LIKE/ILIKE/GLOB patterns with escapes,
printf/format specs, base64/hex, levenshtein/jaro_winkler/hamming,
nfc_normalize/strip_accents, md5/sha256, parse_path family, and
regexp_* — composed to bounded depth over unicode-rich atoms plus the
fixture's string columns. Deliberately AVOIDED (adjudicated permissive
supersets / loud-on-both classes the allowlist already documents):
rpad/lpad with EMPTY pad, overlay(PLACING), dynamic (column-valued)
LIKE patterns, hamming on unequal lengths, to_base beyond [2,36]."""

# unicode-rich atoms: 1/2/3/4-byte codepoints, combining marks (é as
# e+U+0301 vs precomposed), case-mapping landmines (ß→SS, İ, final
# sigma), pattern metacharacters, path shapes
STR_LITS = [
    "héllo😀", "straße", "İstanbul", "ΣΊΣΥΦΟΣ", "café", "café",
    "", " a b ", "abc", "ABCdef", "100% sure_thing", "/a/b/c.txt",
    "a,b,,c", "xxaxx", "MiXeD", "ﬁne", "ǅungla", "ab😀c😀", "  ",
    "tab\there", "über", "ÑOÑO",
]
STR_COLS = ["o_orderpriority", "o_orderstatus"]


def str_lit(rng):
    return "'" + rng.choice(STR_LITS) + "'"


def gen_str_expr(rng, depth):
    """A VARCHAR-valued expression of bounded depth."""
    if depth <= 0:
        return rng.choice(STR_COLS) if rng.random() < 0.35 else str_lit(rng)
    a = lambda: gen_str_expr(rng, depth - 1)
    k = rng.random()
    if k < 0.10:
        return f"upper({a()})" if rng.random() < 0.5 else f"lower({a()})"
    if k < 0.16:
        fn = rng.choice(["trim", "ltrim", "rtrim"])
        if rng.random() < 0.5:
            return f"{fn}({a()})"
        return f"{fn}({a()}, '{rng.choice(['x', ' ', 'xy', 'é', '😀'])}')"
    if k < 0.22:
        return (f"substr({a()}, {rng.choice([-3, -1, 0, 1, 2, 5])}, "
                f"{rng.choice([0, 1, 2, 3, 10])})")
    if k < 0.27:
        fn = rng.choice(["left", "right"])
        return f"{fn}({a()}, {rng.choice([-2, -1, 0, 1, 2, 7])})"
    if k < 0.33:
        # pad chars NONEMPTY (rpad-empty is an adjudicated superset)
        fn = rng.choice(["lpad", "rpad"])
        return f"{fn}({a()}, {rng.choice([0, 2, 5, 9])}, '{rng.choice(['x', 'xy', 'é'])}')"
    if k < 0.38:
        return f"repeat({a()}, {rng.choice([-1, 0, 1, 3])})"
    if k < 0.44:
        return f"replace({a()}, '{rng.choice(['a', 'b', 'é', ' '])}', '{rng.choice(['', 'X', '😀'])}')"
    if k < 0.48:
        return f"translate({a()}, '{rng.choice(['abc', 'aé'])}', '{rng.choice(['xy', 'XYZ', ''])}')"
    if k < 0.54:
        return f"reverse({a()})"
    if k < 0.60:
        return f"({a()} || {a()})" if rng.random() < 0.5 else \
            f"concat({a()}, {a()}, {a()})"
    if k < 0.65:
        return (f"split_part({a()}, '{rng.choice([',', ' ', '', 'é'])}', "
                f"{rng.choice([1, 2, -1, 5])})")
    if k < 0.70:
        return f"nfc_normalize({a()})" if rng.random() < 0.5 else \
            f"strip_accents({a()})"
    if k < 0.74:
        return f"md5({a()})"
    if k < 0.79:
        # BLOB casts take ASCII-only inputs: duck 1.0.0's STRING->BLOB
        # conversion ERRORS on non-ascii bytes (adjudicated superset —
        # the engine passes UTF-8 through)
        if rng.random() < 0.5:
            return f"to_base64(CAST('{rng.choice(['hi', 'abc', 'AB cd', ''])}' AS BLOB))"
        return f"hex({a()})"
    if k < 0.84:
        return (f"regexp_replace({a()}, '{rng.choice(['[a-z]+', 'é', chr(92) + 'd'])}', "
                f"'{rng.choice(['*', '', 'X'])}')")
    if k < 0.88:
        return (f"regexp_extract({a()}, '{rng.choice(['([a-z]+)', '(.)(.)'])}', "
                f"{rng.choice([0, 1])})")
    if k < 0.93:
        fmt = rng.choice(["%s|%s", "%5s.", "%d:%s", "%x"])
        if "%d" in fmt:
            return f"printf('{fmt}', {rng.choice([0, 42, -7])}, {a()})"
        if fmt == "%x":
            return f"printf('{fmt}', {rng.choice([255, 4095])})"
        if fmt == "%5s.":
            return f"printf('{fmt}', {a()})"
        return f"printf('{fmt}', {a()}, {a()})"
    return (f"array_to_string(string_split({a()}, "
            f"'{rng.choice([',', ' ', 'é'])}'), ';')")


def gen_str_measure(rng):
    """An INT/DOUBLE/BOOL measure over string expressions."""
    a = lambda: gen_str_expr(rng, rng.choice([1, 2]))
    k = rng.random()
    if k < 0.22:
        # octet_length is EXCLUDED: duck 1.0.0 has no VARCHAR overload
        # (errors) while the engine accepts it — adjudicated superset
        fn = rng.choice(["length", "strlen", "bit_length"])
        return f"{fn}({a()})"
    if k < 0.32:
        fn = rng.choice(["ascii", "unicode"])
        return f"{fn}({a()})"
    if k < 0.44:
        fn = rng.choice(["strpos", "instr"])
        return f"{fn}({a()}, '{rng.choice(['a', 'é', '', 'b c'])}')"
    if k < 0.56:
        return f"levenshtein({a()}, {a()})"
    if k < 0.64:
        return f"round(jaro_winkler_similarity({a()}, {a()}), 4)"
    if k < 0.72:
        fn = rng.choice(["contains", "starts_with", "ends_with", "prefix",
                         "suffix"])
        return f"CAST({fn}({a()}, '{rng.choice(['a', 'A', 'é', ''])}') AS INT)"
    if k < 0.86:
        # LITERAL patterns only (dynamic patterns keep Spark's backslash
        # escape — documented residual); backslash class goes through the
        # ESCAPE-clause rewrite
        op = rng.choice(["LIKE", "ILIKE", "NOT LIKE", "GLOB"])
        if op == "GLOB":
            pat = rng.choice(["*a*", "a?c", "[abc]*", "*"])
        else:
            pat = rng.choice(["%a%", "A%", "_b_", "100\\%%", "a\\_c", "%é%",
                              "%😀%"])
        return f"CAST(({a()} {op} '{pat}') AS INT)"
    return f"length(parse_filename('{rng.choice(['/a/b/c.txt', 'x/y.tar.gz', '/n.v'])}'))"


def gen_str_probe(rng):
    outs = []
    for _ in range(rng.choice([2, 3])):
        if rng.random() < 0.55:
            outs.append(gen_str_expr(rng, rng.choice([1, 2, 3])))
        else:
            outs.append(gen_str_measure(rng))
    sel = ", ".join(f"{e} AS e{i}" for i, e in enumerate(outs))
    return (f"SELECT o_orderkey, {sel} FROM orders "
            f"WHERE o_orderkey < 8 ORDER BY o_orderkey")


"""Nested-types mode (r15, eleventh mode — VERDICT r14 #2): deep
compositions over lists-of-lists, lists-of-structs, maps-of-lists and
nested structs — the surface the flat list/map modes (r11) never
stress. Families: deep subscript/dot chains, struct ordering inside
list_sort, nested equality/comparison (incl. ORDER BY and GROUP BY on
nested keys), comprehensions over nested lists, flatten/reduce/zip,
map-of-list subscripts (duck's LIST-wrapper semantics), to_json over
nested shapes, struct_pack/struct_insert round-trips. Deliberately
AVOIDED (adjudicated duck-1.0.0-error supersets, allowlisted r14,
driver sentinels q248/q249): nested list_distinct, greatest/least over
lists; plus list_resize over nested elements (1.0.0 has no overload)."""

NLI_LITS = [
    "[[1, 2], [3]]", "[[1], [], [4, 5]]", "[[]]", "[[-1, 0], [2]]",
    "[[5, 1], [5, 1], [2]]", "[[9, 8, 7]]",
]
# NULL-bearing atoms (r15 nested-NULL closure): inner NULLs exercise
# duck's context-sensitive comparison semantics — 3VL in value context,
# NULL-high total order in filter/join/CASE (Select) context — and the
# NULL-high list_sort element order. EXCLUDED from ORDER BY probe shapes
# (row-level ORDER BY with inner NULLs is the documented residual).
NLI_NULL_LITS = NLI_LITS + [
    "[[1, NULL], [2]]", "[[NULL]]", "[NULL, [1, 2]]", "[[1, NULL], [1, 2]]",
]
LST_LITS = [
    "[{'k': 2, 'v': 'b'}, {'k': 1, 'v': 'a'}]",
    "[{'k': 1, 'v': 'a'}, {'k': 1, 'v': 'b'}, {'k': 0, 'v': 'c'}]",
    "[{'k': 3, 'v': 'z'}]",
]
MLI_LITS = [
    "MAP {'a': [1, 2], 'b': [3]}", "MAP {'a': [], 'b': [7, 8]}",
    "MAP {'q': [0]}",
]
DEEP_LITS = [
    "{'s': {'t': {'u': 7}}}", "{'s': {'t': {'u': -1}}}",
]


def gen_nli(rng, depth, nulls=False):
    """A LIST-of-LIST-of-INT expression of bounded depth."""
    if depth <= 0:
        if rng.random() < 0.3:
            return f"[[o_orderkey % 5, 1], [{rng.choice([2, 6])}]]"
        return rng.choice(NLI_NULL_LITS if nulls else NLI_LITS)
    a = lambda: gen_nli(rng, depth - 1, nulls)
    r = rng.random()
    if r < 0.14:
        return f"list_sort({a()})"
    if r < 0.24:
        return f"list_reverse_sort({a()})"
    if r < 0.38:
        return f"list_concat({a()}, {a()})"
    if r < 0.50:
        s = rng.choice([1, 2, -1])
        return f"list_slice({a()}, {s}, {s + rng.choice([0, 1])})"
    if r < 0.62:
        return f"list_filter({a()}, x -> len(x) = {rng.choice([0, 1, 2])})"
    if r < 0.74:
        return f"list_transform({a()}, x -> list_append(x, {rng.choice([0, 9])}))"
    if r < 0.86:
        return f"list_append({a()}, [{rng.choice([6, 42])}])"
    return f"[x FOR x IN {a()} IF len(x) >= {rng.choice([1, 2])}]"


def gen_nest_scalar(rng):
    """A scalar (or flat-list) measure over a nested expression."""
    nli = lambda: gen_nli(rng, rng.choice([1, 2]))
    lst = lambda: rng.choice(LST_LITS)
    mli = lambda: rng.choice(MLI_LITS)
    r = rng.random()
    if r < 0.08:
        return f"len({nli()})"
    if r < 0.16:
        return f"len(flatten({nli()}))"
    if r < 0.22:
        return f"list_sum(flatten({nli()}))"
    if r < 0.28:
        return f"({nli()})[{rng.choice([1, 2, -1])}][{rng.choice([1, -1])}]"
    if r < 0.34:
        return f"list_position({nli()}, {rng.choice(['[2, 6]', '[3]', '[]'])})"
    if r < 0.40:
        return f"CAST(list_contains({nli()}, {rng.choice(['[1, 2]', '[3]'])}) AS INT)"
    if r < 0.46:
        return f"CAST(({nli()} {rng.choice(['=', '<', '>=', '<>'])} {nli()}) AS INT)"
    if r < 0.52:
        return f"({lst()})[{rng.choice([1, 2, -1])}].{rng.choice(['k', 'v'])}"
    if r < 0.58:
        return f"array_to_string(list_transform(list_sort({lst()}), s -> s.v), ',')"
    if r < 0.63:
        return f"array_to_string([s.v FOR s IN {lst()} IF s.k >= 1], ';')"
    if r < 0.68:
        return f"array_to_string(flatten({mli()}['{rng.choice(['a', 'b', 'q'])}']), ',')"
    if r < 0.73:
        return f"array_to_string(map_keys({mli()}), ',')"
    if r < 0.78:
        return f"cardinality({mli()})"
    if r < 0.83:
        d = rng.choice(DEEP_LITS)
        return f"({d}).s.t.u" if rng.random() < 0.5 else \
            f"struct_pack(a := {nli()}).a[1][1]"
    if r < 0.88:
        return f"to_json({rng.choice(DEEP_LITS + LST_LITS)})"
    if r < 0.94:
        # list_append guarantees a NON-empty reduce input (duck errors on
        # empty — loud on both engines, but with different classes)
        return (f"list_reduce(list_append({nli()}, [0]), (acc, x) -> list_concat(acc, x))"
                if rng.random() < 0.5 else f"flatten({nli()})")
    # duck's map_entries structs are named key/value
    return f"map_entries({mli()})[1].{rng.choice(['key', 'value'])}"


def gen_nest_null_probe(rng):
    """Context-sensitive comparison probes over NULL-bearing nests (r15
    closure): value-context 3VL (projected booleans, IS NULL), Select-
    context total order (WHERE / CASE WHEN / join ON), list_contains
    nulls-equal matching, list_sort NULL-high element order."""
    a = lambda: gen_nli(rng, rng.choice([0, 1]), nulls=True)
    op = rng.choice(["=", "<>", "<", "<=", ">", ">="])
    r = rng.random()
    if r < 0.2:
        # value context: project the 3VL result (serialize the unknown)
        return (f"SELECT o_orderkey, CAST(({a()} {op} {a()}) AS VARCHAR) AS e "
                "FROM orders WHERE o_orderkey < 8 ORDER BY o_orderkey")
    if r < 0.35:
        # Select context: CASE WHEN
        return (f"SELECT o_orderkey, CASE WHEN {a()} {op} {a()} THEN 1 ELSE 0 END AS c "
                "FROM orders WHERE o_orderkey < 8 ORDER BY o_orderkey")
    if r < 0.5:
        # Select context: WHERE (count the surviving rows)
        return (f"SELECT count(*) AS n FROM orders "
                f"WHERE ({a()} {op} {a()}) AND o_orderkey < 8")
    if r < 0.62:
        return (f"SELECT o_orderkey, CAST(list_contains({a()}, "
                f"{rng.choice(['[1, NULL]', '[1, 2]', '[NULL]', '[]'])}) AS INT) AS c "
                "FROM orders WHERE o_orderkey < 8 ORDER BY o_orderkey")
    if r < 0.78:
        dirs = rng.choice(["", ", 'DESC'", ", 'ASC', 'NULLS FIRST'",
                           ", 'DESC', 'NULLS FIRST'"])
        return (f"SELECT o_orderkey, array_to_string(list_transform("
                f"list_sort({a()}{dirs}), x -> coalesce(array_to_string("
                f"list_transform(x, e -> coalesce(e, -99)), '+'), 'N')), ';') AS s "
                "FROM orders WHERE o_orderkey < 8 ORDER BY o_orderkey")
    if r < 0.9:
        # Select context: join ON nested equality with inner NULLs
        return ("SELECT a.k AS ak, b.k AS bk FROM "
                "(SELECT o_orderkey AS k, [o_orderkey % 3, CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE 1 END] AS g "
                "FROM orders WHERE o_orderkey < 8) a JOIN "
                "(SELECT o_orderkey AS k, [o_orderkey % 3, CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE 1 END] AS g "
                f"FROM orders WHERE o_orderkey < 8) b ON a.g {rng.choice(['=', '<'])} b.g AND a.k <= b.k "
                "ORDER BY ak, bk")
    # map comparisons (duck: entry-list walk, order-sensitive)
    m = lambda: rng.choice(["MAP {'a': 1, 'b': 2}", "MAP {'b': 2, 'a': 1}",
                            "MAP {'a': 1}", "MAP {'a': o_orderkey % 2}",
                            "MAP {'a': NULL}"])
    if rng.random() < 0.5:
        return (f"SELECT o_orderkey, CAST(({m()} {rng.choice(['=', '<'])} {m()}) AS VARCHAR) AS e "
                "FROM orders WHERE o_orderkey < 8 ORDER BY o_orderkey")
    return (f"SELECT o_orderkey, CASE WHEN {m()} = {m()} THEN 1 ELSE 0 END AS c "
            "FROM orders WHERE o_orderkey < 8 ORDER BY o_orderkey")


def gen_nest_probe(rng):
    r = rng.random()
    if r < 0.25:
        return gen_nest_null_probe(rng)
    if r < 0.33:
        # nested GROUP BY key (list-of-int derived from a column)
        return ("SELECT [o_orderkey % 3, CAST(o_orderkey < 10 AS INT)] AS g, "
                "count(*) AS c, CAST(sum(o_orderkey) AS BIGINT) AS s "
                "FROM orders WHERE o_orderkey < 25 GROUP BY g ORDER BY g")
    if r < 0.4:
        # ORDER BY a nested expression (NULL-FREE atoms: row-level
        # ordering with inner NULLs is the documented residual)
        e = gen_nli(rng, 1)
        return (f"SELECT o_orderkey, {e} AS e FROM orders "
                "WHERE o_orderkey < 12 ORDER BY e, o_orderkey")
    outs = []
    for _ in range(rng.choice([1, 2])):
        if rng.random() < 0.45:
            outs.append(gen_nli(rng, rng.choice([1, 2])))
        else:
            outs.append(gen_nest_scalar(rng))
    sel = ", ".join(f"{e} AS e{i}" for i, e in enumerate(outs))
    return (f"SELECT o_orderkey, {sel} FROM orders "
            f"WHERE o_orderkey < 25 ORDER BY o_orderkey")


"""Window-frame mode (r15, twelfth mode): the window surface has pinned
declared entries (EXCLUDE, FILTER, named windows, RANGE interval
frames) but never had a dedicated randomized generator. Families:
ROWS/RANGE/GROUPS frames with every bound combination, frame-sensitive
aggregates over each, ranking/navigation functions (lead/lag defaults,
nth_value, ntile), IGNORE NULLS variants, EXCLUDE clauses on RANGE
frames (the pinned translatable class), expression-valued PARTITION/
ORDER keys, and multiple windows per probe. DETERMINISM: every ORDER BY
inside a window spec is made total (o_orderkey tiebreak) so both
engines agree on peer sets; probe output is projected per row and
sorted by the probe's outer ORDER BY. Deliberately AVOIDED (documented
residuals / loud classes): EXCLUDE GROUP/TIES on ROWS frames (loud),
RANGE with expression offsets over non-numeric keys beyond the pinned
interval class, and DISTINCT inside window aggregates (both loud)."""

WIN_AGGS = ["sum", "min", "max", "count", "avg"]


def gen_win_frame(rng):
    # GROUPS mode is EXCLUDED: Spark has no GROUPS frames (known gap,
    # r15 win-mode scout — duck supports them; loud on the engine)
    unit = rng.choice(["ROWS", "RANGE"])
    lo = rng.choice(["UNBOUNDED PRECEDING", "3 PRECEDING", "1 PRECEDING",
                     "CURRENT ROW"])
    hi = rng.choice(["CURRENT ROW", "1 FOLLOWING", "2 FOLLOWING",
                     "UNBOUNDED FOLLOWING"])
    # a frame's low bound must not be after its high bound
    order = ["UNBOUNDED PRECEDING", "3 PRECEDING", "1 PRECEDING",
             "CURRENT ROW", "1 FOLLOWING", "2 FOLLOWING",
             "UNBOUNDED FOLLOWING"]
    if order.index(lo) > order.index(hi):
        lo = "UNBOUNDED PRECEDING"
    return unit, f"{unit} BETWEEN {lo} AND {hi}"


def gen_win_probe(rng):
    part = rng.choice(["o_orderstatus", "o_orderpriority",
                       "o_orderkey % 3", "o_custkey % 4"])
    okey = rng.choice(["o_custkey % 5", "o_orderkey % 7", "o_custkey % 3"])
    r = rng.random()
    outs = []
    if r < 0.45:
        for _ in range(rng.choice([1, 2])):
            agg = rng.choice(WIN_AGGS)
            v = rng.choice(["o_orderkey % 11", "o_custkey % 13", "1"])
            unit, fr = gen_win_frame(rng)
            # ROWS frames need a TOTAL order (tied peers would make the
            # row sequence engine-dependent); RANGE offset frames demand
            # a SINGLE numeric key and are peer-set-deterministic
            ob = f"{okey}, o_orderkey" if unit == "ROWS" else okey
            spec = f"PARTITION BY {part} ORDER BY {ob} {fr}"
            e = f"{agg}({v}) OVER ({spec})"
            if agg == "avg":
                e = f"round({e}, 4)"
            outs.append(e)
    elif r < 0.62:
        fn = rng.choice([
            "row_number()", "rank()", "dense_rank()", "ntile(3)",
            f"lead(o_orderkey % 9, {rng.choice([1, 2])}, -1)",
            f"lag(o_orderkey % 9, {rng.choice([1, 2])}, -1)",
            "first_value(o_orderkey % 9)", "last_value(o_orderkey % 9)",
            "nth_value(o_orderkey % 9, 2)"])
        spec = f"PARTITION BY {part} ORDER BY {okey}, o_orderkey"
        if fn.startswith(("first_value", "last_value", "nth_value")):
            # total order → ROWS frames are deterministic
            unit, fr = gen_win_frame(rng)
            spec += " " + fr.replace("RANGE", "ROWS")
        outs.append(f"{fn} OVER ({spec})")
    elif r < 0.78:
        # IGNORE NULLS navigation over a NULL-bearing value
        v = "(CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderkey % 9 END)"
        fn = rng.choice(["first_value", "last_value",
                         "lead", "lag"])
        arg = v if fn in ("first_value", "last_value") else f"{v}, 1, -1"
        fr = "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING" \
            if fn in ("first_value", "last_value") else ""
        outs.append(f"{fn}({arg} IGNORE NULLS) OVER (PARTITION BY {part} "
                    f"ORDER BY o_orderkey {fr})")
    else:
        # EXCLUDE on a RANGE frame — SUBTRACTABLE aggregates only (the
        # r8 closure rewrites EXCLUDE via frame subtraction; min/max
        # have no subtraction identity and stay LOUD — documented
        # residual, r15 win-mode find)
        agg = rng.choice(["sum", "count", "avg"])
        ex = rng.choice(["EXCLUDE CURRENT ROW", "EXCLUDE GROUP",
                         "EXCLUDE TIES"])
        lo = rng.choice(["UNBOUNDED PRECEDING", "1 PRECEDING"])
        hi = rng.choice(["CURRENT ROW", "1 FOLLOWING", "UNBOUNDED FOLLOWING"])
        outs.append(f"{agg}(o_orderkey % 11) OVER (PARTITION BY {part} "
                    f"ORDER BY {okey} RANGE BETWEEN {lo} AND {hi} {ex})")
    sel = ", ".join(f"{e} AS w{i}" for i, e in enumerate(outs))
    return (f"SELECT o_orderkey, {sel} FROM orders "
            f"WHERE o_orderkey < 60 ORDER BY o_orderkey")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    mode = sys.argv[3] if len(sys.argv) > 3 else "scalar"
    rng = random.Random(seed)
    print(f"# generated {mode} probes: n={n} seed={seed} "
          "(dev/gen_probes.py — deterministic)")
    if mode == "query":
        for _ in range(n):
            print(gen_query(rng))
        return
    if mode == "stmt":
        for _ in range(n):
            print(gen_stmt(rng))
        return
    if mode == "list":
        for _ in range(n):
            print(gen_list_probe(rng))
        return
    if mode == "map":
        for _ in range(n):
            print(gen_map_probe(rng))
        return
    if mode == "dml":
        for i in range(n):
            print(gen_dml(rng, i))
        return
    if mode == "ts":
        for _ in range(n):
            print(gen_ts_probe(rng))
        return
    if mode == "num":
        for _ in range(n):
            print(gen_num_probe(rng))
        return
    if mode == "dec":
        for _ in range(n):
            print(gen_dec_probe(rng))
        return
    if mode == "str":
        for _ in range(n):
            print(gen_str_probe(rng))
        return
    if mode == "nest":
        for _ in range(n):
            print(gen_nest_probe(rng))
        return
    if mode == "win":
        for _ in range(n):
            print(gen_win_probe(rng))
        return
    for i in range(n):
        ty = rng.choice([INT, DBL, STR, DATE, BOOL])
        e = gen(rng, ty, rng.choice([2, 3]))
        # doubles can differ in last ulp through different eval orders —
        # round the final value for comparison
        if ty == DBL:
            e = f"round({e}, 4)"
        if ty == DATE:
            e = f"({e})::VARCHAR"
        print(f"SELECT o_orderkey, {e} AS e FROM orders "
              "WHERE o_orderkey < 30 ORDER BY o_orderkey")


if __name__ == "__main__":
    main()
