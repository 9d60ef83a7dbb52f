"""Character spans and non-overlapping span selection.

Semantics parity: /root/reference/yargy/span.py:5-82 (Span record,
max-coverage dynamic program used by ``Parser.findall``).  The DP picks
the set of non-overlapping spans that maximizes the number of covered
characters; ties are broken toward later suffixes exactly like the
reference so findall output order matches golden tests.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional, Tuple

Span = Tuple[int, int]  # half-open [start, stop)


def span_len(span: Span) -> int:
    return span[1] - span[0]


def _next_compatible(spans: List[Span]) -> List[Optional[int]]:
    """For each span, index of the first span starting at/after its stop.

    Mirrors the scan in the reference (span.py:27-34): spans are assumed
    ordered by (start asc, stop desc); the *first* such index is taken.
    """
    out: List[Optional[int]] = []
    for _, stop in spans:
        hit: Optional[int] = None
        for j, (start, _) in enumerate(spans):
            if start >= stop:
                hit = j
                break
        out.append(hit)
    return out


def pick_max_coverage(spans: List[Span]) -> Iterator[Span]:
    """Select non-overlapping spans maximizing covered characters.

    Equivalent to ``resolve_spans`` (span.py:42-82): a right-to-left DP
    where ``best[i]`` is the max coverage using spans[i:] and the chosen
    index set is propagated; on an exact coverage tie the solution
    that INCLUDES spans[i] wins (the code keeps ``take`` unless it is
    strictly smaller), matching the reference's ``cover < previous``
    comparison (span.py:60-66).
    """
    if not spans:
        return

    n = len(spans)
    nxt = _next_compatible(spans)
    best = [0] * n
    chosen: List[Optional[set]] = [None] * n

    for i in range(n - 1, -1, -1):
        if i == n - 1:
            best[i] = span_len(spans[i])
            chosen[i] = {i}
            continue
        take = span_len(spans[i])
        members = {i}
        if nxt[i] is not None:
            take += best[nxt[i]]
            members |= chosen[nxt[i]]
        if take < best[i + 1]:
            best[i] = best[i + 1]
            chosen[i] = chosen[i + 1]
        else:
            best[i] = take
            chosen[i] = members

    for i in sorted(chosen[0]):
        yield spans[i]
