"""Pure-Python Aho-Corasick automaton for multi-pattern first-occurrence
search (no external deps — the container has no pyahocorasick).

Used by the mention detector when the gazetteer is large: the per-surface
``str.find`` loop is O(|gaz| · |text|); the automaton is O(|text| + matches)
per document regardless of dictionary size.  Semantics are identical to the
find loop: for each pattern, the position of its FIRST occurrence (1-based),
or absence.  Equivalence is pytest-asserted on randomized inputs.
"""

from __future__ import annotations

from collections import deque


class AhoCorasick:
    __slots__ = ("goto", "fail", "out")

    def __init__(self, patterns: list[str]):
        # goto: list of dict char -> state; out: list of list of pattern ids
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[tuple[int, int]]] = [[]]  # (pattern_id, pattern_len)
        for pid, pat in enumerate(patterns):
            state = 0
            for ch in pat:
                nxt = self.goto[state].get(ch)
                if nxt is None:
                    nxt = len(self.goto)
                    self.goto[state][ch] = nxt
                    self.goto.append({})
                    self.out.append([])
                state = nxt
            if pat:
                self.out[state].append((pid, len(pat)))
        # BFS failure links
        self.fail = [0] * len(self.goto)
        q: deque[int] = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in self.goto[r].items():
                q.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[s] = self.goto[f].get(ch, 0)
                if self.fail[s] == s:
                    self.fail[s] = 0
                self.out[s] = self.out[s] + self.out[self.fail[s]]

    def first_occurrences(self, text: str) -> dict[int, int]:
        """pattern_id -> 1-based position of first occurrence in text."""
        res: dict[int, int] = {}
        state = 0
        goto, fail, out = self.goto, self.fail, self.out
        for i, ch in enumerate(text):
            while state and ch not in goto[state]:
                state = fail[state]
            state = goto[state].get(ch, 0)
            if out[state]:
                for pid, plen in out[state]:
                    if pid not in res:
                        res[pid] = i - plen + 2  # 1-based start
        return res
