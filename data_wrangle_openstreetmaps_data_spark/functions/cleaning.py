"""Cleaning / audit scalar functions from the reference, as pure Column exprs.

Reference semantics (file:line cites into /root/reference/openstreet_kolkata.py):

- key classification regexes         openstreet_kolkata.py:115-117,450-452
- key_type 4-way priority classify   openstreet_kolkata.py:114-128
- street type extraction regex       openstreet_kolkata.py:175
- street audit expected whitelist    openstreet_kolkata.py:181-183
- street_mapping normalize dict      openstreet_kolkata.py:192-216
- fix_street_name                    openstreet_kolkata.py:217-237
- city_mapping + fix_city_name       openstreet_kolkata.py:253-268
- postcode audit                     openstreet_kolkata.py:270-289

Reference bugs deliberately NOT replicated (SURVEY.md §7 "implement intent"):
- fix_street_name slices ``name[:-len(street_type)]`` with the *normalized*
  (dot-stripped, lowered) token length, so dotted suffixes like "Rd." would
  yield "MG RRoad".  We strip the full matched token ("MG Rd." -> "MG Road").
- fix_city_name looks up only the first word, so the multi-word mapping keys
  ("salt lake", "dum dum cantt") are unreachable.  We check the full
  lowercased name first, then the first word.
- fix_postcode (openstreet_kolkata.py:291-295) is dead code with a NameError;
  not ported. The postcode *audit* carries its semantics.

Everything here is a native Column expression: constant-folded by Catalyst,
inlined into whole-stage codegen — no Python in the executor hot path, which
is what lets these run over 100 TB of tag data.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- key classification -----------------------------------------------------
# Reference regexes, openstreet_kolkata.py:115-117. `search` semantics ==
# unanchored rlike; the lower / lower_colon patterns are themselves anchored.
LOWER_RE = r"^([a-z]|_)*$"
LOWER_COLON_RE = r"^([a-z]|_)*:([a-z]|_)*$"
PROBLEMCHARS_RE = r"""[=\+/&<>;'"\?%#$@,\. \t\r\n]"""


def key_class(key: Column | str) -> Column:
    """4-way key classification, priority order per openstreet_kolkata.py:118-127:
    problemchars > lower_colon > lower > other."""
    k = F.col(key) if isinstance(key, str) else key
    return (
        F.when(k.rlike(PROBLEMCHARS_RE), F.lit("problemchars"))
        .when(k.rlike(LOWER_COLON_RE), F.lit("lower_colon"))
        .when(k.rlike(LOWER_RE), F.lit("lower"))
        .otherwise(F.lit("other"))
    )


# --- street cleaning ---------------------------------------------------------
# Last whitespace-delimited token with optional trailing dot
# (openstreet_kolkata.py:175; IGNORECASE is irrelevant for \S but kept).
STREET_TYPE_RE = r"(?i)\b\S+\.?$"

# Canonical street-type whitelist used by the audit (openstreet_kolkata.py:181-183).
EXPECTED_STREET_TYPES = (
    "Avenue", "Boulevard", "Connector", "Commons", "Court",
    "Drive", "Parkway", "Place", "Lane", "Road", "Row",
    "Sarani", "Square", "Street", "Trail",
)

# Normalization dictionary (openstreet_kolkata.py:192-216), keyed by
# lower(token with trailing '.' stripped).
STREET_MAPPING: dict[str, str] = {
    "street": "Street", "st": "Street",
    "raod": "Road", "road": "Road", "rd": "Road",
    "avenue": "Avenue", "ave": "Avenue",
    "boulevard": "Boulevard", "blvd": "Boulevard",
    "drive": "Drive", "dr": "Drive",
    "circle": "Circle", "cir": "Circle",
    "court": "Court", "ct": "Court",
    "pally": "Pally",
    "place": "Place", "pl": "Place",
    "potty": "Potty",
    "square": "Square", "sqr": "Square",
    "lane": "Lane", "ln": "Lane",
}

# Leading house-number pattern (openstreet_kolkata.py:229).
HOUSENUM_RE = r"^\s*\d+/?\d*[a-zA-Z]?,?[^a-zA-Z]*"


def street_type(street: Column | str) -> Column:
    """Extract the street-type token (empty string when no match, matching
    Spark/DuckDB regexp_extract no-match semantics)."""
    c = F.col(street) if isinstance(street, str) else street
    return F.regexp_extract(c, STREET_TYPE_RE, 0)


def _mapping_case(key_col: Column, mapping: dict[str, str]) -> Column:
    """Literal-map lookup (NULL on miss) — equivalent to a broadcast-joined
    lookup table but with zero shuffle, and one compact expression instead
    of an N-branch CASE chain (smaller codegen, faster first-run compile)."""
    if not mapping:
        return F.lit(None).cast("string")
    entries: list[Column] = []
    for k, v in mapping.items():
        entries.extend([F.lit(k), F.lit(v)])
    return F.element_at(F.create_map(*entries), key_col)


def normalize_street_type(street: Column | str) -> Column:
    """Dictionary-normalize the trailing street-type token
    (fix_street_name first half, openstreet_kolkata.py:221-225; intent-level
    fix of the dotted-token slicing bug — see module docstring)."""
    c = F.col(street) if isinstance(street, str) else street
    token = street_type(c)
    norm_key = F.lower(F.regexp_replace(token, r"\.$", ""))
    canonical = _mapping_case(norm_key, STREET_MAPPING)
    # substring(street, 1, len(street)-len(matched token)) || canonical
    head = c.substr(F.lit(1), F.length(c) - F.length(token))
    return F.when(
        canonical.isNotNull() & (token != F.lit("")),
        F.concat(head, canonical),
    ).otherwise(c)


def split_housenumber(street: Column | str) -> tuple[Column, Column]:
    """Split a leading house number out of a street name
    (fix_street_name second half, openstreet_kolkata.py:228-234).

    Returns ``(housenumber, remainder)``; housenumber is NULL when absent.
    Cleanup mirrors ``m.rstrip().rstrip(',').lstrip()``.
    """
    c = F.col(street) if isinstance(street, str) else street
    match = F.regexp_extract(c, HOUSENUM_RE, 0)
    housenum = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(match, r"\s+$", ""), r",$", ""),
        r"^\s+",
        "",
    )
    housenum = F.when(match != F.lit(""), housenum)
    remainder = F.when(
        match != F.lit(""), c.substr(F.length(match) + F.lit(1), F.length(c))
    ).otherwise(c)
    return housenum, remainder


def fix_street_name(street: Column | str) -> tuple[Column, Column]:
    """Full fix_street_name (openstreet_kolkata.py:217-237): normalize the
    street-type suffix, then lift a leading house number.

    Returns ``(housenumber, fixed_name)`` — one input column, two output
    columns, exactly the reference's return contract.
    """
    normalized = normalize_street_type(street)
    return split_housenumber(normalized)


def normalize_street_type_join(df, street_col: str, mapping_df=None,
                               spark=None):
    """Broadcast-join variant of ``normalize_street_type`` for when the
    mapping is a TABLE rather than a literal dict (millions of rows —
    can't constant-fold). Same output; the lookup becomes a broadcast
    hash join on the normalized token.

    mapping_df schema: (norm_key string, canonical string); defaults to
    STREET_MAPPING materialized as a DataFrame."""
    from pyspark.sql import functions as F  # noqa: F811

    if mapping_df is None:
        spark = spark or df.sparkSession
        mapping_df = spark.createDataFrame(
            list(STREET_MAPPING.items()), ["norm_key", "canonical"]
        )
    c = F.col(street_col)
    token = street_type(c)
    keyed = df.withColumn("_tok", token).withColumn(
        "_norm_key", F.lower(F.regexp_replace(F.col("_tok"), r"\.$", ""))
    )
    joined = keyed.join(
        F.broadcast(mapping_df),
        keyed["_norm_key"] == mapping_df["norm_key"],
        "left",
    )
    head = c.substr(F.lit(1), F.length(c) - F.length(F.col("_tok")))
    fixed = F.when(
        F.col("canonical").isNotNull() & (F.col("_tok") != ""),
        F.concat(head, F.col("canonical")),
    ).otherwise(c)
    return joined.withColumn(f"{street_col}_fixed", fixed).drop(
        "_tok", "_norm_key", "norm_key", "canonical"
    )


# --- city cleaning -----------------------------------------------------------
# openstreet_kolkata.py:253-259
CITY_MAPPING: dict[str, str] = {
    "kolkata": "Kolkata",
    "saltlake": "Salt Lake (Bidhannagar)",
    "salt lake": "Salt Lake (Bidhannagar)",
    "dum dum cantt": "Dum Dum Cantonment, Kolkata",
    "bamangachi": "Bamangachi",
}


def fix_city_name(city: Column | str) -> Column:
    """Dictionary-normalize a city name (openstreet_kolkata.py:261-268).

    Intent-level: full lowercased name is checked first (making the
    reference's unreachable multi-word keys work), then the first word.
    """
    c = F.col(city) if isinstance(city, str) else city
    full_key = F.lower(c)
    first_word = F.lower(F.split(c, " ", 2).getItem(0))
    by_full = _mapping_case(full_key, CITY_MAPPING)
    by_first = _mapping_case(first_word, CITY_MAPPING)
    return F.coalesce(by_full, by_first, c)


# --- postcode audit ----------------------------------------------------------


def postcode_digits(value: Column | str) -> Column:
    """First digit run in the value; '' when none.  Equivalent to the
    reference's ``\\s*\\d+\\s*`` search + strip (openstreet_kolkata.py:270-283):
    stripping whitespace from a ``\\s*\\d+\\s*`` match leaves exactly ``\\d+``."""
    c = F.col(value) if isinstance(value, str) else value
    return F.regexp_extract(c, r"\d+", 0)


def postcode_bucket(key: Column | str, value: Column | str) -> Column:
    """Audit bucket label: key ++ len(digit-run), or key ++ '0' on no-match
    (openstreet_kolkata.py:283-288)."""
    k = F.col(key) if isinstance(key, str) else key
    digits = postcode_digits(value)
    return F.concat(k, F.length(digits).cast("string"))


def postcode_valid(value: Column | str) -> Column:
    """True iff the extracted digit run is exactly 6 long
    (openstreet_kolkata.py:285-286)."""
    return F.length(postcode_digits(value)) == 6


def is_postcode_key(key: Column | str) -> Column:
    """Prefix/suffix predicate (openstreet_kolkata.py:271-273): matches both
    addr:postcode and addr:postal_code."""
    k = F.col(key) if isinstance(key, str) else key
    return k.startswith("addr:post") & k.endswith("code")


def fuzzy_match_street_type(df, street_col: str = "street",
                            max_dist: int = 2, spark=None):
    """Fuzzy tier of X2 (openstreet_kolkata.py:192-225): the reference's
    dictionary only fixes typos someone already cataloged ("raod"); this
    matches EVERY distinct observed trailing street-type token to its
    nearest canonical type by Levenshtein distance (≤ ``max_dist``),
    surfacing unseen misspellings as a suggested normalization table
    (token, canonical, dist).

    Plan shape: the corpus is scanned ONCE for the distinct lowered
    tokens; candidates are distinct-tokens × the 15-entry canonical
    whitelist via a broadcast cross join — a bounded dimension product,
    never corpus-scale; Levenshtein runs JVM-side (codegen). The output
    table is itself broadcastable back over the corpus as the lookup of
    a second normalization pass. Deterministic: ties break
    (dist, canonical)."""
    from pyspark.sql import Window

    spark = spark or df.sparkSession
    canon = spark.createDataFrame(
        [(c,) for c in EXPECTED_STREET_TYPES], ["canonical"]
    )
    token = F.lower(
        F.regexp_replace(street_type(F.col(street_col)), r"\.$", "")
    )
    toks = (
        df.select(token.alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    scored = (
        toks.crossJoin(F.broadcast(canon))
        .withColumn(
            "dist", F.levenshtein(F.col("token"), F.lower(F.col("canonical")))
        )
        .filter(F.col("dist") <= max_dist)
    )
    w = Window.partitionBy("token").orderBy("dist", "canonical")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("token", "canonical", F.col("dist").cast("long").alias("dist"))
    )
