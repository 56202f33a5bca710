"""Oracle-side IEEE ``-0.0`` normalization (VERDICT r11 task #1).

DuckDB's ``round(x, n)`` on DOUBLE preserves the sign of zero: any value in
``(-0.5·10⁻ⁿ, 0)`` rounds to ``-0.0`` (verified: ``round((-4e-7)::DOUBLE, 6)``
→ ``-0.0``). Spark's ``F.round`` goes through ``BigDecimal`` HALF_UP, which
has no signed zero, so the same value rounds to ``+0.0`` — and the driver's
value hash is BIT-sensitive, so a single such row reddens the whole query
(the r11 ``williams_r_14_1h`` failure: 119/3,809 rows where the close sat at
the window high). Appending ``+ 0.0`` normalizes: ``-0.0 + 0.0 = +0.0`` in
IEEE 754, every other value is unchanged, and NULL stays NULL.

The hazard is latent in EVERY oracle ``round()`` site whose argument can be
a tiny negative (MACD histograms, correlations, z-scores, margins), so the
fix is applied centrally: :func:`normalize_round_neg_zero` rewrites every
``round(...)`` call in an oracle SQL string to ``(round(...) + 0.0)`` at
registration time (``registry.build_oracles``) — present AND future oracles
are covered without touching 300+ source sites, and the rewrite reaches the
driver because the driver consumes ``oracle_sql()``'s returned strings.

The rewriter is a tiny SQL-aware scanner, not a regex: it skips
single-quoted string literals, double-quoted identifiers, ``--`` line
comments, and ``/* ... */`` block comments, and paren-matches with the same
awareness, recursing into the
call's argument list so nested rounds normalize too. Unit-tested in
``tests/test_oracle_parity.py`` alongside the other two historical
check-green/driver-red canonicalization classes (HUGEINT sums, DECIMAL
literal typing).
"""

from __future__ import annotations

import re

_WORD = "round"
# an already-normalized call reads "(round(...) + 0.0)": "(" immediately
# left of the word, " + 0.0)" immediately after the matching paren
_ALREADY_AFTER = re.compile(r"\s*\+\s*0\.0\s*\)")


def _is_word_boundary(sql: str, i: int) -> bool:
    if i == 0:
        return True
    prev = sql[i - 1]
    return not (prev.isalnum() or prev in "_.$")


def _scan_token(sql: str, i: int) -> int:
    """Advance past a string literal / quoted identifier / line comment
    starting at ``i``; return the index just after it (or ``i`` if none)."""
    n = len(sql)
    c = sql[i]
    if c == "'" or c == '"':
        j = i + 1
        while j < n:
            if sql[j] == c:
                # doubled quote = escaped quote inside the literal
                if j + 1 < n and sql[j + 1] == c:
                    j += 2
                    continue
                return j + 1
            j += 1
        return n  # unterminated — treat rest as literal
    if c == "-" and i + 1 < n and sql[i + 1] == "-":
        j = sql.find("\n", i)
        return n if j < 0 else j + 1
    if c == "/" and i + 1 < n and sql[i + 1] == "*":
        # block comment: skip to the closing */ (ADVICE r12 — a 'round('
        # or unbalanced paren inside /* ... */ must not be scanned)
        j = sql.find("*/", i + 2)
        return n if j < 0 else j + 2
    return i


def _match_paren(sql: str, i: int) -> int:
    """``i`` points at ``(``; return the index of its matching ``)`` or -1,
    skipping strings/identifiers/comments."""
    n = len(sql)
    depth = 0
    while i < n:
        j = _scan_token(sql, i)
        if j != i:
            i = j
            continue
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def normalize_round_neg_zero(sql: str) -> str:
    """Rewrite every SQL ``round(...)`` call to ``(round(...) + 0.0)``."""
    out: list[str] = []
    i = 0
    n = len(sql)
    emitted = 0
    while i < n:
        j = _scan_token(sql, i)
        if j != i:
            i = j
            continue
        if (
            sql[i : i + len(_WORD)].lower() == _WORD
            and _is_word_boundary(sql, i)
        ):
            k = i + len(_WORD)
            while k < n and sql[k] in " \t\n":
                k += 1
            if k < n and sql[k] == "(":
                close = _match_paren(sql, k)
                if close >= 0:
                    # idempotence: skip a call already wrapped as
                    # "(round(...) + 0.0)" — the main loop keeps scanning
                    # INSIDE it, so nested calls still normalize
                    p = i - 1
                    while p >= 0 and sql[p] in " \t\n":
                        p -= 1
                    if (
                        p >= 0
                        and sql[p] == "("
                        and _ALREADY_AFTER.match(sql, close + 1)
                    ):
                        i += len(_WORD)
                        continue
                    inner = normalize_round_neg_zero(sql[k + 1 : close])
                    out.append(sql[emitted:i])
                    out.append(f"(round({inner}) + 0.0)")
                    emitted = close + 1
                    i = close + 1
                    continue
        i += 1
    out.append(sql[emitted:])
    return "".join(out)
