"""Best-tracking rules for the bench artifacts (r11 ADVICE, fixed
r12): the record must be scoped to one workload definition — a best
recorded under a lighter workload must RESET when the measured
workload changes, and subset (BENCH_custom) runs never carry best
fields at all (asserted here against the writer's path rule)."""

from __future__ import annotations

import bench


def test_decide_best_carries_prior_within_same_workload():
    prior = {
        "workload_fingerprint": "abc",
        "best_value": 80.0,
        "best_ref_sec": 0.75,
    }
    best, ref = bench.decide_best(prior, 90.0, 0.80, "abc")
    assert (best, ref) == (80.0, 0.75)


def test_decide_best_improves_within_same_workload():
    prior = {
        "workload_fingerprint": "abc",
        "best_value": 80.0,
        "best_ref_sec": 0.75,
    }
    best, ref = bench.decide_best(prior, 70.0, 0.90, "abc")
    assert (best, ref) == (70.0, 0.90)


def test_decide_best_resets_on_workload_change():
    """The r11 ADVICE scenario: the prior record was set under a
    LIGHTER workload (different fingerprint) — carrying it forward
    would enshrine an unreachable best that hides regressions."""
    prior = {
        "workload_fingerprint": "old-lighter-workload",
        "best_value": 80.0,
        "best_ref_sec": 0.75,
    }
    best, ref = bench.decide_best(prior, 95.0, 0.80, "new-heavier")
    assert (best, ref) == (95.0, 0.80)


def test_decide_best_resets_on_pre_fingerprint_artifact():
    # artifacts written before r12 carry no fingerprint: reset
    prior = {"best_value": 80.0, "best_ref_sec": 0.75, "value": 85.0}
    best, ref = bench.decide_best(prior, 95.0, 0.80, "fp")
    assert (best, ref) == (95.0, 0.80)


def test_decide_best_falls_back_to_prior_value_fields():
    # a same-workload prior from before best-tracking: its latest
    # value/ref stand in for the missing best_* fields
    prior = {"workload_fingerprint": "fp", "value": 80.0, "ref_sec": 0.7}
    best, ref = bench.decide_best(prior, 90.0, 0.80, "fp")
    assert (best, ref) == (80.0, 0.7)


def test_workload_fingerprint_is_stable_and_name_sensitive():
    names = ["multi_way_join_enrich", "group_multiples_having"]
    a = bench.workload_fingerprint(names)
    b = bench.workload_fingerprint(list(reversed(names)))
    assert a == b  # order-insensitive (sorted inside)
    c = bench.workload_fingerprint(["multi_way_join_enrich"])
    assert a != c  # dropping a query is a different workload


def test_code_fingerprint_ignores_docstrings_keeps_literals():
    """The fingerprint must track what EXECUTES: docstring/comment
    edits (and the decorator's oracle-SQL argument, which never
    reaches the builder's code object) must not reset the perf
    record, while a changed literal (a bound, a cap) must."""
    import hashlib

    def f1(x):
        """doc A"""
        # a comment
        return x + 500

    def f2(x):
        """doc B — reworded"""
        return x + 500

    def f3(x):
        """doc A"""
        return x + 501

    def hp(fn):
        h = hashlib.sha256()
        bench._hash_code_object(fn.__code__, h)
        return h.hexdigest()

    assert hp(f1) == hp(f2)
    assert hp(f1) != hp(f3)


def test_custom_artifact_path_carries_no_best_fields():
    """The writer attaches best_* only to per-SF artifacts; the rule
    is path-based, so pin the path decision: a subset run (ONLY env)
    must route to BENCH_custom.json."""
    import inspect

    src = inspect.getsource(bench.main)
    assert "BENCH_custom.json" in src
    # decide_best is gated behind the not-custom branch
    gate = src.index('if not out_path.endswith("BENCH_custom.json")')
    call = src.index("decide_best(")
    assert call > gate


def test_slot0_string_literal_not_mistaken_for_docstring():
    """r12 ADVICE: on newer interpreters a docstring-less function can
    carry a MEANINGFUL string literal in consts slot 0; skipping it
    unconditionally would let an edit to that literal keep the perf
    record. With the owner's __doc__ at hand the docstring test is
    exact: a slot-0 string differing from __doc__ is hashed, a genuine
    docstring is still skipped."""
    import hashlib
    import inspect

    def g():
        """doc"""
        return 1

    flag = getattr(inspect, "CO_HAS_DOCSTRING", 0)

    def mk(consts, has_doc):
        c = g.__code__.replace(co_consts=consts)
        if flag:  # 3.13+: keep the flag truthful for the exact path
            c = c.replace(
                co_flags=(c.co_flags | flag) if has_doc else (c.co_flags & ~flag)
            )
        return c

    def hp(code, owner_doc):
        h = hashlib.sha256()
        bench._hash_code_object(code, h, owner_doc=owner_doc)
        return h.hexdigest()

    # owner has NO docstring: slot-0 strings are executable literals
    assert hp(mk(("lit-A", 1), False), None) != hp(mk(("lit-B", 1), False), None)
    # genuine docstring slot (slot 0 == owner __doc__) is still skipped
    assert hp(mk(("doc A", 1), True), "doc A") == hp(
        mk(("doc B", 1), True), "doc B"
    )
