"""The reference's only tested logic, preserved as properties.

Mirrors test/Kinesis/CoordinationTests.hs:32-55 (SmallCheck) with
hypothesis: node coverage, exactly-once item placement, balance
max-min < 2, idempotence, membership-change correctness. Generators match
the reference's: non-empty deduplicated node/item sets
(test/Kinesis/CoordinationTests.hs:75-88).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_app_spark.streaming.assign import assign

nodes_st = st.lists(st.integers(0, 50), min_size=1, max_size=10, unique=True)
items_st = st.lists(st.characters(min_codepoint=97, max_codepoint=122),
                    min_size=0, max_size=26, unique=True)


@settings(max_examples=200, deadline=None)
@given(nodes_st, items_st)
def test_all_nodes_present(nodes, items):
    assert set(assign(nodes, items).keys()) == set(nodes)


@settings(max_examples=200, deadline=None)
@given(nodes_st, items_st)
def test_items_exactly_once(nodes, items):
    result = assign(nodes, items)
    flat = [it for v in result.values() for it in v]
    assert sorted(flat) == sorted(items)


@settings(max_examples=200, deadline=None)
@given(nodes_st, items_st)
def test_balance_invariant(nodes, items):
    result = assign(nodes, items)
    loads = [len(v) for v in result.values()]
    assert max(loads) - min(loads) < 2


@settings(max_examples=200, deadline=None)
@given(nodes_st, items_st)
def test_idempotent(nodes, items):
    once = assign(nodes, items)
    twice = assign(nodes, items, once)
    assert {n: sorted(v) for n, v in once.items()} == {
        n: sorted(v) for n, v in twice.items()
    }


@settings(max_examples=200, deadline=None)
@given(nodes_st, nodes_st, items_st)
def test_membership_change(old_nodes, new_nodes, items):
    """After the node set changes, keys are exactly the new nodes and the
    item multiset is preserved (reference: CoordinationTests.hs:58-67)."""
    before = assign(old_nodes, items)
    after = assign(new_nodes, items, before)
    assert set(after.keys()) == set(new_nodes)
    assert sorted(it for v in after.values() for it in v) == sorted(items)


@settings(max_examples=100, deadline=None)
@given(nodes_st, items_st)
def test_minimal_disturbance_on_node_add(nodes, items):
    """Adding one node moves at most ceil(len(items)/len(nodes)) items —
    the 'minimal disturbance' intent of the reference's assign."""
    before = assign(nodes, items)
    new_node = max(nodes) + 1
    after = assign(nodes + [new_node], items, before)
    moved = 0
    pos_before = {it: n for n, v in before.items() for it in v}
    for n, v in after.items():
        for it in v:
            if pos_before[it] != n:
                moved += 1
    limit = (len(items) + len(nodes) - 1) // len(nodes) if nodes else 0
    assert moved <= max(limit, len(items) // (len(nodes) + 1) + 1)
