"""Golden-fixture tests for the cleaning scalar functions (FIXTURES.md §5,
ported from the reference's behavior: fix_street_name
openstreet_kolkata.py:217-237, fix_city_name :261-268, audit_postcode
:270-289, key_type :114-128)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.functions import cleaning


def test_street_fix_golden(spark):
    cases = [
        # (name_in, housenum_out, name_out)
        ("Jessore road", None, "Jessore Road"),
        ("Dum Dum raod", None, "Dum Dum Road"),
        ("Park st", None, "Park Street"),
        ("MG Rd.", None, "MG Road"),
        ("24/j, shyamsundar pally", "24/j", "shyamsundar Pally"),
        ("41, Jawaharlal Nehru Road", "41", "Jawaharlal Nehru Road"),
        ("Sarat Bose Avenue", None, "Sarat Bose Avenue"),
        ("Gariahat Sarani", None, "Gariahat Sarani"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["street"])
    housenum, fixed = cleaning.fix_street_name("street")
    got = df.select(
        "street", housenum.alias("hn"), fixed.alias("out")
    ).collect()
    by_name = {r["street"]: (r["hn"], r["out"]) for r in got}
    for name_in, hn, out in cases:
        assert by_name[name_in] == (hn, out), name_in


def test_city_fix_golden(spark):
    cases = [
        ("kolkata", "Kolkata"),
        ("Kolkata", "Kolkata"),
        ("saltlake", "Salt Lake (Bidhannagar)"),
        ("Bamangachi", "Bamangachi"),
        # intent-level (multi-word keys, unreachable in the reference):
        ("Salt Lake", "Salt Lake (Bidhannagar)"),
        ("dum dum cantt", "Dum Dum Cantonment, Kolkata"),
        ("Chicago", "Chicago"),  # unmapped → unchanged
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["city"])
    got = {
        r["city"]: r["out"]
        for r in df.select(
            "city", cleaning.fix_city_name("city").alias("out")
        ).collect()
    }
    for cin, cout in cases:
        assert got[cin] == cout, cin


def test_postcode_audit_golden(spark):
    cases = [
        # (k, v, bucket, code, valid)
        ("addr:postcode", "700091", "addr:postcode6", "700091", True),
        ("addr:postcode", " 700 091 ", "addr:postcode3", "700", False),
        ("addr:postcode", "7000", "addr:postcode4", "7000", False),
        ("addr:postal_code", "7400", "addr:postal_code4", "7400", False),
        ("addr:postcode", "Kol-64", "addr:postcode2", "64", False),
    ]
    df = spark.createDataFrame([(k, v) for k, v, *_ in cases], ["k", "v"])
    got = df.select(
        "k",
        "v",
        cleaning.postcode_bucket("k", "v").alias("bucket"),
        cleaning.postcode_digits("v").alias("code"),
        cleaning.postcode_valid("v").alias("valid"),
    ).collect()
    by_kv = {(r["k"], r["v"]): r for r in got}
    for k, v, bucket, code, valid in cases:
        r = by_kv[(k, v)]
        assert r["bucket"] == bucket, (k, v)
        assert r["code"] == code, (k, v)
        assert r["valid"] == valid, (k, v)


def test_postcode_key_predicate(spark):
    df = spark.createDataFrame(
        [("addr:postcode",), ("addr:postal_code",), ("addr:street",), ("postcode",)],
        ["k"],
    )
    got = {
        r["k"]: r["is_pc"]
        for r in df.select(
            "k", cleaning.is_postcode_key("k").alias("is_pc")
        ).collect()
    }
    assert got == {
        "addr:postcode": True,
        "addr:postal_code": True,
        "addr:street": False,
        "postcode": False,
    }


def test_key_class_golden(spark):
    cases = [
        ("amenity", "lower"),
        ("addr:street", "lower_colon"),
        ("addr:street:name", "other"),
        ("name:en", "lower_colon"),
        ("FIXME", "other"),
        ("k with space", "problemchars"),
        ("tiger.source", "problemchars"),  # priority: problemchars first
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["k"])
    got = {
        r["k"]: r["cls"]
        for r in df.select("k", cleaning.key_class("k").alias("cls")).collect()
    }
    for k, cls in cases:
        assert got[k] == cls, k


def test_fuzzy_street_match_catches_unseen_typos(spark):
    """The dictionary tier can only fix cataloged typos; the fuzzy tier
    must map typos it has never seen ('avneue', 'streeet') to the right
    canonical type, leave exact names at dist 0, and drop tokens beyond
    the threshold ('xyzzy')."""
    from data_wrangle_openstreetmaps_data_spark.functions.cleaning import (
        fuzzy_match_street_type,
    )

    df = spark.createDataFrame(
        [
            ("1 Main avneue",),   # unseen typo, dist 2 → Avenue
            ("2 Oak streeet",),   # unseen typo, dist 1 → Street
            ("3 Elm Road",),      # exact, dist 0
            ("4 Foo xyzzy",),     # > max_dist → absent
        ],
        ["street"],
    )
    got = {
        r["token"]: (r["canonical"], r["dist"])
        for r in fuzzy_match_street_type(df).collect()
    }
    assert got["avneue"] == ("Avenue", 2)
    assert got["streeet"] == ("Street", 1)
    assert got["road"] == ("Road", 0)
    assert "xyzzy" not in got
