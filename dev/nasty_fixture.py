#!/usr/bin/env python3
"""Build an adversarially-perturbed copy of an sf dir for tokenizer
edge-case sweeps: same tables, same row counts, but documents.text
gains trailing / leading / doubled interior spaces, a non-ASCII
(BMP-only) token, and one fully-empty document on deterministic
doc_id strata (n_chars recomputed to keep the n_chars = len(text)
generator invariant; Python len counts code points, matching Spark's
UTF8String.numChars and DuckDB's len — astral-plane chars are
deliberately excluded since they'd also have to survive parquet
round-trips identically). Running dev/check.py against the output
proves the Spark engine and the DuckDB oracle agree on empty-token,
Unicode-length, and empty-string-split semantics — the divergence
class the round-6 split(" ", -1) fix closed — instead of relying on
the clean fixtures never exercising them.

Usage: python3 dev/nasty_fixture.py [srcSfDir] [outDir]
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_nasty"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]

os.makedirs(OUT, exist_ok=True)
for t in TABLES:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

tab = pq.read_table(f"{SRC}/documents.parquet")
cols = {name: tab.column(name).to_pylist() for name in tab.column_names}

n_perturbed = 0
for i, (doc_id, text) in enumerate(zip(cols["doc_id"], cols["text"])):
    orig = text
    # Order keeps each stratum pure under overlap: the Unicode append
    # and interior doubling run first (on original text), the leading
    # prepend next, and the trailing append LAST — so a %7 doc always
    # ends with a space even when it is also %13, and a %5 doc's
    # doubled space is a genuine interior one even when it is also %11.
    if doc_id % 13 == 0:
        text = text + " naïve-日本語"       # non-ASCII token (BMP only)
    if doc_id % 5 == 0 and " " in text:
        text = text.replace(" ", "  ", 1)  # interior empty token
    if doc_id % 11 == 0:
        text = " " + text          # leading empty token
    if doc_id % 7 == 0:
        text = text + " "          # trailing empty token
    if doc_id == 250:
        text = ""                          # fully-empty document
    if text != orig:
        n_perturbed += 1
        cols["text"][i] = text
        cols["n_chars"][i] = len(text)

# Normalized-dup stratum: the clean corpus has no duplicates at all
# (exact or normalized), so q21/q139 see only singleton groups there.
# Rewrite doc 2k+1's text to a case/whitespace/punctuation mangle of
# doc 2k's (k in a fixed id set) — byte-DIFFERENT (q21 keeps them
# apart) but canonically identical (q139 must merge them, with
# n_raw_variants = 2, on BOTH engines). Runs after the strata above so
# the source text is the already-perturbed one (empty tokens and
# non-ASCII bytes flow through the canonicalizer too).
by_id = {d: i for i, d in enumerate(cols["doc_id"])}
n_normdup = 0
for a in (12, 34, 56, 78, 90):
    ia, ib = by_id.get(a), by_id.get(a + 1)
    if ia is None or ib is None:
        sys.exit(f"normalized-dup stratum doc_ids {a}/{a+1} not in corpus")
    # ASCII-only case flip: Python .upper() is NOT canonicalization-
    # transparent for non-ASCII ('ß'→'SS', 'ﬁ'→'FI' map INTO [a-z]
    # after lower(), while the original char strips away entirely) —
    # that would silently break the byte-different/canonically-equal
    # invariant this stratum exists to exercise.
    flipped = "".join(
        ch.upper() if "a" <= ch <= "z" else ch for ch in cols["text"][ia])
    mangled = "  " + flipped.replace(" ", " , ") + " !"
    cols["text"][ib] = mangled
    cols["n_chars"][ib] = len(mangled)
    n_normdup += 1
print(f"normalized-dup stratum: {n_normdup} mangled copies "
      f"(doc pairs {[ (a, a+1) for a in (12, 34, 56, 78, 90) ]})")

# Exact-dup stratum for the incremental-dedup classifier (q152) and
# the whole-corpus exact dedup (q21): the clean corpus has no exact
# duplicates below sf0.1, so q152's three-way classification
# (novel / dup_base / dup_delta) would go un-exercised cross-engine.
# Doc ids chosen by the SAME HashBucket split q152 uses
# (md5-bucket % 100, >= 80 => delta) and outside every perturbation
# stratum above (%5/%7/%11/%13, 250, normalized-dup pairs), so the
# copies stay byte-identical:
#   base 1 -> delta 8            : dup_base (index hit)
#   base 2 -> delta 27, delta 31 : dup_base twice from one base sig
#   delta 16 -> delta 19         : within-batch pair (16 novel,
#                                  19 dup_delta, lowest-id keeper)
n_exactdup = 0
for src_id, dst_id in ((1, 8), (2, 27), (2, 31), (16, 19)):
    isrc, idst = by_id.get(src_id), by_id.get(dst_id)
    if isrc is None or idst is None:
        sys.exit(f"exact-dup stratum doc_ids {src_id}/{dst_id} not in corpus")
    cols["text"][idst] = cols["text"][isrc]
    cols["n_chars"][idst] = len(cols["text"][isrc])
    n_exactdup += 1
print(f"exact-dup stratum: {n_exactdup} verbatim copies "
      f"(base->delta 1->8, 2->27, 2->31; delta->delta 16->19)")

out = pa.table(
    {name: pa.array(cols[name], type=tab.schema.field(name).type)
     for name in tab.column_names})
pq.write_table(out, f"{OUT}/documents.parquet")
print(f"perturbed {n_perturbed}/{len(cols['doc_id'])} documents -> {OUT}")

# Embeddings stratum: vec_id 123 becomes the all-zero vector (a failed
# encoder output). The cosine family must EXCLUDE it identically on
# both engines (Spark orders NaN above every double, so an unguarded
# 0/0 cosine passes >= t filters there and not in DuckDB — the
# divergence the cvecs/normedSql nrm > 0 guard closes); the L2 and
# moment queries (q58/q77/q115/q130) must keep it and still agree.
etab = pq.read_table(f"{SRC}/embeddings.parquet")
ecols = {name: etab.column(name).to_pylist() for name in etab.column_names}
try:
    zi = ecols["vec_id"].index(123)
except ValueError:
    sys.exit(f"probe vec_id 123 not in {SRC}/embeddings.parquet - "
             "pick an existing id for the zero-vector stratum")
ecols["embedding"][zi] = [0.0] * len(ecols["embedding"][0])
# NULL and ragged (truncated) vectors — failed/partial encoder outputs.
# The similarity layer's dimension contract (vecs / len(embedding)=Dim
# in every oracle CTE) must exclude both identically on both engines;
# unguarded, DuckDB's list_inner_product hard-errors on ragged input
# while Spark silently computes over whatever is there.
#
# The strata land on BOTH sides of every query/probe-id threshold:
# 222/333 sit above all of them (corpus/neighbor side), while 13/17
# sit inside the kNN/IVF query sets (q29/q58 use vec_id < 20,
# q30/q132 < 28) and 42/77 inside q116's probe set (vec_id < 100) —
# so the sweep also proves query-side exclusion agrees between
# engines (the gap a corpus-only stratum structurally cannot see:
# an unfiltered ragged PROBE gets all-NULL cosines on Spark and
# votes via the vec_id tiebreak while the oracle drops it). All ids
# stay >= 8 so the (pre-r7) centroid seed set is untouched.
ragged_ids = [333, 13, 77]
null_ids = [222, 17, 42]
try:
    for vid in null_ids:
        ecols["embedding"][ecols["vec_id"].index(vid)] = None
    for vid in ragged_ids:
        i = ecols["vec_id"].index(vid)
        ecols["embedding"][i] = ecols["embedding"][i][:10]
except ValueError:
    sys.exit(f"probe vec_ids {null_ids + ragged_ids} not all in embeddings"
             " - pick existing ids for the null/ragged strata")
eout = pa.table(
    {name: pa.array(ecols[name], type=etab.schema.field(name).type)
     for name in etab.column_names})
pq.write_table(eout, f"{OUT}/embeddings.parquet")
print(f"embeddings strata: zeroed 123, nulled {null_ids}, "
      f"truncated {ragged_ids}")
