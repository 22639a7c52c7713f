"""Balanced work assignment — kept as a *test oracle*, not production code.

The only logic the reference actually tests is its pure shard->node
assignment algorithm (`assign`, src/Kinesis/Coordination.hs:474-509, and
`balanceAssignments`, :513-533; properties at
test/Kinesis/CoordinationTests.hs:32-55). In the Spark engine the
scheduler owns assignment, so this module exists to (a) preserve the
reference's tested invariants as executable properties and (b) assert
those same invariants over our own observed partition distributions
(tests/test_assign_properties.py).

Semantics (re-derived from the reference's documented behavior, not a
translation): keep existing placements where possible (minimal
disturbance), drop dead nodes/work, give new work to some node, then
greedily level until max-min < 2.
"""

from __future__ import annotations

from collections.abc import Hashable, Sequence


def assign(
    nodes: Sequence[Hashable],
    items: Sequence[Hashable],
    current: dict[Hashable, list[Hashable]] | None = None,
) -> dict[Hashable, list[Hashable]]:
    """Balanced assignment of items to nodes with minimal reassignment.

    Invariants (the reference's tested properties):
    - result keys == nodes, every item appears exactly once;
    - balance: max load - min load < 2;
    - idempotent: assign(n, i, assign(n, i, {})) == assign(n, i, {}).
    """
    if not nodes:
        raise ValueError("no nodes to assign to")
    nodes = list(dict.fromkeys(nodes))
    items_set = set(items)
    current = current or {}

    # keep live placements of live items, in stable order
    result: dict[Hashable, list[Hashable]] = {n: [] for n in nodes}
    placed: set[Hashable] = set()
    for n in nodes:
        for it in current.get(n, []):
            if it in items_set and it not in placed:
                result[n].append(it)
                placed.add(it)

    # orphaned (owner died) + brand-new items -> first node, then level.
    # dict.fromkeys dedups duplicate input items (order-preserving) so each
    # appears exactly once, mirroring the node dedup above.
    leftovers = [it for it in dict.fromkeys(items) if it not in placed]
    result[nodes[0]].extend(leftovers)

    return _balance(result)


def _balance(
    assignment: dict[Hashable, list[Hashable]]
) -> dict[Hashable, list[Hashable]]:
    """Greedy leveling: move one item from the most- to the least-loaded
    node until max-min < 2. Terminates: the gap strictly shrinks."""
    result = {n: list(v) for n, v in assignment.items()}
    while True:
        hi = max(result, key=lambda n: len(result[n]))
        lo = min(result, key=lambda n: len(result[n]))
        if len(result[hi]) - len(result[lo]) < 2:
            return result
        result[lo].append(result[hi].pop())
