"""Heap-stack driver for generator-recursive tree walkers.

The formatter/stylizer walkers descend per DOM depth. Written as plain
recursion they hit Python's C-stack limit on adversarial crawl HTML
(~1000+ nested open tags — reproduced at depth 5000), and one such document
would fail an entire Spark task. Instead each walker is a *generator* that
``yield``s its child walks; :func:`run_trampoline` drives the generators
with an explicit list-based stack, so depth is bounded by heap like the
serialize/textContent/selector walkers in ``dom.py``.
"""

from __future__ import annotations

__all__ = ["run_trampoline"]


def run_trampoline(gen):
    """Run a generator-recursive walk iteratively.

    A walker yields sub-generators instead of calling itself; a walker's
    ``return value`` propagates back as the value of the ``yield``
    expression in its parent. Returns the root walker's return value.
    """
    stack = [gen]
    result = None
    while stack:
        try:
            sub = stack[-1].send(result)
        except StopIteration as stop:
            result = stop.value
            stack.pop()
        else:
            stack.append(sub)
            result = None
    return result
