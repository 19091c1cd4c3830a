"""Hierarchical timing trees (plonky2 ``TimingTree`` / ``timed!`` rebuild).

The reference wraps every proving step in a TimingTree and prints it
(ivc_based_vpbs.rs:301,331-340; SURVEY.md section 5). Same idea here as a
context-manager tree; ``block_until_ready``-free (callers decide whether
to sync), printed via the standard logging module.
"""

from __future__ import annotations

import contextlib
import logging
import time

log = logging.getLogger("vfhe_tpu")


class TimingTree:
    def __init__(self, name: str, print_on_done: bool = True):
        self.name = name
        self.children: list = []
        self._stack = [self]
        self._t0 = time.perf_counter()
        self.elapsed = None
        self._print = print_on_done

    @contextlib.contextmanager
    def scope(self, name: str):
        node = TimingTree.__new__(TimingTree)
        node.name = name
        node.children = []
        node._t0 = time.perf_counter()
        node.elapsed = None
        node._print = False
        parent = self._stack[-1]
        parent.children.append(node)
        self._stack.append(node)
        try:
            yield node
        finally:
            node.elapsed = time.perf_counter() - node._t0
            self._stack.pop()

    def done(self) -> None:
        self.elapsed = time.perf_counter() - self._t0
        if self._print:
            self.print()

    def print(self, level: int = logging.INFO) -> None:
        for line in self.render():
            log.log(level, line)

    def render(self, depth: int = 0) -> list:
        el = self.elapsed if self.elapsed is not None else \
            (time.perf_counter() - self._t0)
        lines = [f"{'  ' * depth}{el:8.4f}s  {self.name}"]
        for c in self.children:
            lines.extend(c.render(depth + 1))
        return lines
