#!/usr/bin/env python3
"""Regenerates src/test/resources/reference_digest_fixture.json by EXECUTING
the reference's identity-digest functions (compute_hash_identity /
compute_funnel_identity, graflo/architecture/schema/identity_digest.py)
over corner-case payloads — ground truth for ReferenceDigestParitySpec,
which asserts graft's PyJsonCanon-based digests are BYTE-identical.

Each case records the payload canonicalization string AND the hex digest,
plus the Spark type each value must carry for type parity.

Usage:
  PYTHONPATH=/tmp/refstubs:/root/reference python3 tools/gen_digest_fixture.py \
      > src/test/resources/reference_digest_fixture.json
"""
import sys, json, datetime, decimal
sys.path.insert(0, '/tmp/refstubs'); sys.path.insert(0, '/root/reference')

from graflo.architecture.schema.identity_digest import (
    compute_hash_identity, compute_funnel_identity, _digest)
from graflo.architecture.schema.identity_funnel import IdentityFunnel

HASH_CASES = []

def hc(name, doc, fields, types):
    """types: spark type per field (string/long/double/boolean/date/timestamp/decimal)."""
    HASH_CASES.append({
        "name": name, "doc": {k: _enc(v) for k, v in doc.items()},
        "fields": fields, "types": types,
        "canon": json.dumps({f: doc.get(f) for f in fields},
                            sort_keys=True, default=str),
        "digest": compute_hash_identity(doc, fields)})

def _enc(v):
    if isinstance(v, (datetime.date, datetime.datetime, decimal.Decimal)):
        return str(v)
    return v

# --- strings: escaping, unicode, sorting --------------------------------
hc("plain", {"id": "a1"}, ["id"], {"id": "string"})
hc("two_fields_sorted", {"b": "2", "a": "1"}, ["b", "a"],
   {"a": "string", "b": "string"})
hc("missing_field_null", {"a": "1"}, ["a", "b"], {"a": "string", "b": "string"})
hc("empty_string", {"a": "", "b": "x"}, ["a", "b"],
   {"a": "string", "b": "string"})
hc("quotes_backslash", {"a": 'say "hi" \\ now'}, ["a"], {"a": "string"})
hc("control_chars", {"a": "tab\there\nnl\rcr\x00nul\x1fus\x7fdel"}, ["a"],
   {"a": "string"})
hc("unicode_bmp", {"a": "café ΣΩ 中文 — em"}, ["a"], {"a": "string"})
hc("unicode_astral", {"a": "emoji \U0001F600 pair"}, ["a"], {"a": "string"})
hc("key_needs_escape", {'k "q"': "v", "ünï": "w"}, ['k "q"', "ünï"],
   {'k "q"': "string", "ünï": "string"})
hc("underscore_sorts_before_lower", {"_z": "1", "a": "2", "Z": "3"},
   ["_z", "a", "Z"], {"_z": "string", "a": "string", "Z": "string"})

# --- numbers ------------------------------------------------------------
hc("ints", {"a": 0, "b": -17, "c": 123456789012345}, ["a", "b", "c"],
   {"a": "long", "b": "long", "c": "long"})
hc("bool_null", {"t": True, "f": False, "n": None}, ["t", "f", "n"],
   {"t": "boolean", "f": "boolean", "n": "string"})
FLOATS = [0.0, -0.0, 1.0, -1.0, 0.1, 2.5, 1e15, 1e16, 1.5e16, -1e16,
          9999999999999998.0, 1e-4, 0.0001, 9.999e-5, 1e-5, 1e-7, 1.5e-7,
          3.141592653589793, 2.718281828459045e-10, 1e100, -2.5e-100,
          5e-324, 1.7976931348623157e308, 123456.78901234567, 42.0,
          100.0, 0.001, 6.02214076e23, 1.1, 0.30000000000000004]
for i, f in enumerate(FLOATS):
    hc(f"float_{i}", {"x": f}, ["x"], {"x": "double"})

# --- default=str types --------------------------------------------------
hc("date", {"d": datetime.date(2020, 3, 4)}, ["d"], {"d": "date"})
hc("datetime_no_us", {"d": datetime.datetime(2021, 12, 31, 23, 59, 58)},
   ["d"], {"d": "timestamp"})
hc("datetime_us", {"d": datetime.datetime(2021, 1, 2, 3, 4, 5, 60007)},
   ["d"], {"d": "timestamp"})
hc("decimal", {"d": decimal.Decimal("1.50")}, ["d"], {"d": "decimal(10,2)"})
# str(Decimal) flips to scientific notation when the adjusted exponent is
# < -6 (to-scientific-string rule): '1E-7', not '0.0000001'. The Spark
# scale must match the Python decimal's scale — scale IS part of the
# rendering (type-parity caveat in DIVERGENCES.md).
DECIMALS = [("0.0000001", "decimal(10,7)"),   # adjusted -7 → 1E-7
            ("0.00000012345", "decimal(12,11)"),
            ("0.000001", "decimal(10,6)"),    # adjusted -6 → stays plain
            ("0.0000010", "decimal(10,7)"),   # trailing zero kept, still plain
            ("-0.0000001", "decimal(10,7)"),
            ("0.00000001", "decimal(16,8)"),
            ("123.456", "decimal(10,3)"),
            ("0", "decimal(10,0)"),
            ("-42.10", "decimal(10,2)")]
for i, (s, t) in enumerate(DECIMALS):
    hc(f"decimal_{i}", {"d": decimal.Decimal(s)}, ["d"], {"d": t})
hc("mixed_all", {"s": "x", "i": 7, "fl": 2.5, "b": True, "n": None,
                 "u": "ü"}, ["s", "i", "fl", "b", "n", "u"],
   {"s": "string", "i": "long", "fl": "double", "b": "boolean",
    "n": "string", "u": "string"})

# --- funnel cases -------------------------------------------------------
FUNNEL_CASES = []

def fc(name, doc, branches, include_branch_id, types):
    funnel = IdentityFunnel(branches=branches,
                            include_branch_id=include_branch_id)
    FUNNEL_CASES.append({
        "name": name, "doc": {k: _enc(v) for k, v in doc.items()},
        "branches": branches, "include_branch_id": include_branch_id,
        "types": types,
        "digest": compute_funnel_identity(doc, funnel)})

fc("first_branch", {"email": "a@b.c", "phone": "1"}, [
    {"id": "by_email", "fields": ["email"]},
    {"id": "by_phone", "fields": ["phone"]}], False,
   {"email": "string", "phone": "string"})
fc("fallback_branch", {"email": "", "phone": "1", "country": "US"}, [
    {"id": "by_email", "fields": ["email"]},
    {"id": "by_phone", "fields": ["phone", "country"],
     "when_all_present": ["phone", "country"]}], False,
   {"email": "string", "phone": "string", "country": "string"})
fc("no_branch", {"email": None, "phone": ""}, [
    {"id": "by_email", "fields": ["email"]},
    {"id": "by_phone", "fields": ["phone"]}], False,
   {"email": "string", "phone": "string"})
fc("branch_marker", {"email": "a@b.c"}, [
    {"id": "by_email", "fields": ["email"]}], True,
   {"email": "string"})
# when_all_present is a SUBSET of fields (reference validates this): the
# branch fires on the gate alone and digests the full field set, null
# included
fc("when_subset_of_fields", {"gate": "y", "val": None, "alt": "z"}, [
    {"id": "b1", "fields": ["gate", "val"], "when_all_present": ["gate"]},
    {"id": "b2", "fields": ["alt"]}], False,
   {"gate": "string", "val": "string", "alt": "string"})

print(json.dumps({"hash": HASH_CASES, "funnel": FUNNEL_CASES}, indent=1,
                 ensure_ascii=True))
