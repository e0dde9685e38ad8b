"""fuzzy_nearest duplicate-name collapse: the result must be exactly
the naive per-key formulation's — same-name keys never match each
other (dist 0 excluded) and the (dist ASC, key_b ASC) tie-break must
hold THROUGH duplicated names. Built after the sf1 decade audit showed
tiled repeated names turning the blocked join quadratic (2.96 s ->
249 s); the collapse makes pair cost quadratic in DISTINCT names."""

from __future__ import annotations

from ecommerce_dataengineering_project_spark.operators.linkage import fuzzy_nearest


def _naive(rows, max_dist=2):
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    blk = lambda n: n.split(" ")[-1]
    out = {}
    for k, n in rows:
        cands = [
            (lev(n, n2), k2, n2)
            for k2, n2 in rows
            if k2 != k and blk(n2) == blk(n) and 1 <= lev(n, n2) <= max_dist
        ]
        if cands:
            d, k2, n2 = min(cands)
            out[k] = (n, k2, n2, d)
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "key long, name string")
    got = {
        r.key: (r.name, r.nearest_key, r.nearest_name, r.dist)
        for r in fuzzy_nearest(df, "key", "name").collect()
    }
    assert got == _naive(rows)
    return got


def test_duplicated_names_never_match_each_other(spark):
    # three copies of "ab x": no output unless a DIFFERENT name is near
    got = _run(spark, [(1, "ab x"), (2, "ab x"), (3, "ab x")])
    assert got == {}


def test_every_duplicate_gets_the_same_verdict(spark):
    # both copies of "ab x" match "ac x" (dist 1); "ac x" matches the
    # MIN key among the duplicates (tie-break through duplication)
    got = _run(spark, [(5, "ab x"), (9, "ab x"), (7, "ac x")])
    assert got[5] == ("ab x", 7, "ac x", 1)
    assert got[9] == ("ab x", 7, "ac x", 1)
    assert got[7] == ("ac x", 5, "ab x", 1)


def test_tiebreak_min_key_across_names_at_same_dist(spark):
    # "ab x" is dist-1 from BOTH "aa x" (keys 8, 2) and "ac x" (key 4):
    # winner is key 2 (min key at min dist), name "aa x"
    got = _run(
        spark, [(1, "ab x"), (8, "aa x"), (2, "aa x"), (4, "ac x")]
    )
    assert got[1] == ("ab x", 2, "aa x", 1)


def test_closer_name_beats_smaller_key(spark):
    # dist 1 candidate (key 9) must beat dist 2 candidate (key 2)
    got = _run(spark, [(1, "abcd x"), (9, "abcc x"), (2, "abzz x")])
    assert got[1] == ("abcd x", 9, "abcc x", 1)
