#!/usr/bin/env python3
"""Regenerates src/test/resources/reference_caps_fixture.json by EXECUTING
the reference's query-caps lattice (graflo/architecture/query/caps.py +
models.py) — ground truth for ReferenceCapsParitySpec.

Three executed surfaces:
  * narrow:      QueryCaps.narrow(other) — the lattice meet, including the
                 projection allow-list rules (None = unrestricted, [] =
                 nothing, intersection keeps the LEFT side's order).
  * finish_init: GraphQuery.finish_init(caps) — construction-time
                 validation. NOTE it raises on any over-cap value, even a
                 DEFAULT one (no model_fields_set check) — asymmetric with
                 narrowed, and pinned here because a hand-port would
                 'helpfully' clamp.
  * narrowed:    GraphQuery.narrowed(caps) — explicit over-ask raises,
                 defaults clamp (model_fields_set decides), projection is
                 always intersected rather than raising (an allow-list
                 exists to HIDE names), and the caps argument meets
                 HARD_CAPS first so nothing can widen a ceiling.

Errors are recorded structurally (cap, requested, allowed) plus the
formatted message; plain ValueErrors (aggregate-shape rules) record the
message verbatim.

Usage:
  PYTHONPATH=/tmp/refstubs:/root/reference python3 tools/gen_caps_fixture.py \
      > src/test/resources/reference_caps_fixture.json
"""
import sys, json

sys.path.insert(0, '/tmp/refstubs'); sys.path.insert(0, '/root/reference')

from graflo.architecture.query import (
    AggregateQuery, NeighborQuery, NodeQuery, TraverseQuery)
from graflo.architecture.query.caps import QueryCaps, CapExceededError

KINDS = {"node": NodeQuery, "neighbor": NeighborQuery,
         "traverse": TraverseQuery, "aggregate": AggregateQuery}

BASE = {"node": {"vertex_type": "v"},
        "neighbor": {"vertex_type": "v", "key": "k"},
        "traverse": {"seeds": [{"vertex_type": "v", "key": "k"}]},
        "aggregate": {"vertex_type": "v"}}

CASES = []


def case(name, surface, kind=None, fields=None, caps=None, caps_b=None):
    CASES.append({"name": name, "surface": surface, "kind": kind,
                  "fields": fields or {}, "caps": caps or {},
                  "caps_b": caps_b})


# --- narrow: the lattice meet
case("cl_narrow_mins", "narrow",
     caps={"max_hops": 2, "max_rows": 50, "timeout_s": 40.0},
     caps_b={"max_rows": 200, "max_elements": 100, "max_seeds": 3})
case("cl_narrow_allow_none_one", "narrow",
     caps={}, caps_b={"projection_allow_list": ["x", "y"]})
case("cl_narrow_allow_intersect_order", "narrow",
     caps={"projection_allow_list": ["c", "a", "b"]},
     caps_b={"projection_allow_list": ["b", "c", "z"]})
case("cl_narrow_allow_empty_is_not_none", "narrow",
     caps={"projection_allow_list": []},
     caps_b={"projection_allow_list": ["x"]})

# --- finish_init: construction-time validation
case("fi_limit_over", "finish_init", "node", {"limit": 2000})
case("fi_limit_default_still_raises", "finish_init", "node", {},
     caps={"max_rows": 5})
case("fi_timeout_over", "finish_init", "node", {"timeout_s": 60.0})
case("fi_projection_denied_sorted", "finish_init", "node",
     {"projection": ["zz", "a", "secret"]},
     caps={"projection_allow_list": ["a"]})
case("fi_hops_over", "finish_init", "neighbor", {"hops": 5})
case("fi_edge_types_over", "finish_init", "neighbor",
     {"edge_relations": ["r1", "r2", "r3"]}, caps={"max_edge_types": 2})
case("fi_seeds_over", "finish_init", "traverse",
     {"seeds": [{"vertex_type": "v", "key": str(i)} for i in range(11)]})
case("fi_seed_missing_key", "finish_init", "traverse",
     {"seeds": [{"vertex_type": "v"}]})
case("fi_agg_field_required", "finish_init", "aggregate",
     {"function": "MAX"})
case("fi_agg_groupby_noncount", "finish_init", "aggregate",
     {"function": "MIN", "aggregated_field": "f", "group_by": "g"})
case("fi_agg_count_groupby_ok", "finish_init", "aggregate",
     {"group_by": "g"})
case("fi_ok_defaults", "finish_init", "node", {})

# --- narrowed: explicit raises, default clamps
case("nw_limit_default_clamped", "narrowed", "node", {},
     caps={"max_rows": 5})
case("nw_limit_explicit_raises", "narrowed", "node", {"limit": 50},
     caps={"max_rows": 5})
case("nw_limit_explicit_under_kept", "narrowed", "node", {"limit": 3},
     caps={"max_rows": 5})
case("nw_timeout_default_clamped", "narrowed", "node", {},
     caps={"timeout_s": 2.0})
case("nw_timeout_explicit_raises", "narrowed", "node", {"timeout_s": 20.0},
     caps={"timeout_s": 2.0})
case("nw_projection_intersected_never_raises", "narrowed", "node",
     {"projection": ["a", "secret", "b"]},
     caps={"projection_allow_list": ["b", "a"]})
case("nw_hops_explicit_raises", "narrowed", "neighbor", {"hops": 3},
     caps={"max_hops": 2})
case("nw_hops_default_kept", "narrowed", "neighbor", {},
     caps={"max_hops": 2})
case("nw_traverse_hops_default_clamped", "narrowed", "traverse", {},
     caps={"max_hops": 1})
case("nw_edge_types_always_raise", "narrowed", "neighbor",
     {"edge_relations": ["r1", "r2", "r3"]}, caps={"max_edge_types": 2})
case("nw_seeds_always_raise", "narrowed", "traverse",
     {"seeds": [{"vertex_type": "v", "key": str(i)} for i in range(3)]},
     caps={"max_seeds": 2})
case("nw_cannot_widen_hard_caps", "narrowed", "node", {"limit": 2000},
     caps={"max_rows": 99999})
case("nw_widened_timeout_still_hard", "narrowed", "node",
     {"timeout_s": 29.0}, caps={"timeout_s": 99999.0})


def snapshot(q):
    out = {"limit": q.limit, "timeout_s": q.timeout_s,
           "projection": q.projection}
    for f in ("hops", "max_hops"):
        if hasattr(q, f):
            out[f] = getattr(q, f)
    return out


def run_case(c):
    rec = dict(c)
    try:
        if c["surface"] == "narrow":
            merged = QueryCaps(**c["caps"]).narrow(QueryCaps(**(c["caps_b"] or {})))
            rec["result"] = json.loads(merged.model_dump_json())
        else:
            q = KINDS[c["kind"]](**{**BASE[c["kind"]], **c["fields"]})
            caps = QueryCaps(**c["caps"]) if c["caps"] else None
            if c["surface"] == "finish_init":
                q = q.finish_init(caps)
            else:
                q = q.narrowed(caps or QueryCaps())
            rec["result"] = snapshot(q)
        rec["error"] = None
    except CapExceededError as e:
        rec["result"] = None
        rec["error"] = {"type": "CapExceededError", "cap": e.cap,
                        "requested": e.requested, "allowed": e.allowed,
                        "message": str(e)}
    except Exception as e:
        rec["result"] = None
        rec["error"] = {"type": type(e).__name__, "message": str(e)}
    return rec


def main():
    json.dump({"_generator": "tools/gen_caps_fixture.py",
               "cases": [run_case(c) for c in CASES]},
              sys.stdout, indent=1, sort_keys=True)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
