"""Hierarchical tic/toc profiler.

Reference parity: gtsam/base/timing.h (gttic/gttoc + TimingOutline tree,
SURVEY.md §5.1): RAII-scoped sections auto-nest into a global tree keyed by
call structure; `print_timing()` dumps the tree. Device work is made visible
by an optional block_until_ready on section exit.
"""

import time
from contextlib import contextmanager
from typing import Dict, Optional


class _Node:
    __slots__ = ("label", "total", "count", "children")

    def __init__(self, label):
        self.label = label
        self.total = 0.0
        self.count = 0
        self.children: Dict[str, "_Node"] = {}


_root = _Node("root")
_stack = [_root]


@contextmanager
def tic(label: str, sync=None):
    """Scoped timing section (gttic/gttoc analogue).

    sync: optional pytree of device arrays to block on at exit so device time
    is attributed to this section."""
    parent = _stack[-1]
    node = parent.children.setdefault(label, _Node(label))
    _stack.append(node)
    t0 = time.perf_counter()
    try:
        yield node
    finally:
        if sync is not None:
            import jax
            jax.block_until_ready(sync)
        node.total += time.perf_counter() - t0
        node.count += 1
        _stack.pop()


def reset():
    global _root, _stack
    _root = _Node("root")
    _stack = [_root]


def report() -> str:
    """Format the timing tree (tictoc_print_ analogue)."""
    lines = []

    def walk(node, depth):
        for label, child in node.children.items():
            lines.append("%s%-30s %8.3f s  (%d calls, %.4f s/call)" % (
                "  " * depth, label, child.total, child.count,
                child.total / max(child.count, 1)))
            walk(child, depth + 1)

    walk(_root, 0)
    return "\n".join(lines)


def print_timing():
    print(report())
