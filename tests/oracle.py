"""Scalar reference-semantics oracle: pure-Python inverted index + BM25 top-k.

Independent second implementation (per SURVEY.md §5 test plan): the engine's
distributed results must match this doc-at-a-time scorer exactly. Mirrors
bm25.cpp:283-299/495-519 and the top-k heap of utils/index-search.cpp:676-748.
"""

from __future__ import annotations

import math
import re
from collections import Counter

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall((text or "").lower())


class ScalarIndex:
    def __init__(self, docs: dict[str, str]):
        """docs: doc_key -> text. Keys sorted to fix doc order."""
        self.keys = sorted(docs)
        self.tokens = {k: tokenize(docs[k]) for k in self.keys}
        self.tf = {k: Counter(self.tokens[k]) for k in self.keys}
        self.dl = {k: len(self.tokens[k]) for k in self.keys}
        with_field = [k for k in self.keys if self.dl[k] > 0]
        self.n = len(with_field)
        self.ttf = sum(self.dl.values())
        self.avgdl = self.ttf / self.n if self.n else 0.0
        self.df: Counter = Counter()
        for k in self.keys:
            for t in self.tf[k]:
                self.df[t] += 1

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        if df == 0:
            return 0.0
        return math.log1p((self.n - df + 0.5) / (df + 0.5))

    def score_term(self, term: str, key: str, k1=1.2, b=0.75, boost=1.0) -> float | None:
        tf = self.tf[key].get(term)
        if not tf:
            return None
        c0 = boost * (k1 + 1.0) * self.idf(term)
        c1 = k1 * (1 - b) + k1 * b * self.dl[key] / self.avgdl
        return c0 * tf / (c1 + tf)

    def term_query(self, term: str, k=10) -> list[tuple[str, float]]:
        hits = []
        for key in self.keys:
            s = self.score_term(term, key)
            if s is not None:
                hits.append((key, s))
        hits.sort(key=lambda t: (-t[1], t[0]))
        return hits[:k]

    def and_query(self, terms: list[str], k=10, exclude: list[str] = ()) -> list[tuple[str, float]]:
        hits = []
        for key in self.keys:
            ss = [self.score_term(t, key) for t in terms]
            if any(s is None for s in ss):
                continue
            if any(self.tf[key].get(e) for e in exclude):
                continue
            hits.append((key, sum(ss)))
        hits.sort(key=lambda t: (-t[1], t[0]))
        return hits[:k]

    def or_query(self, terms: list[str], k=10, min_match=1) -> list[tuple[str, float]]:
        hits = []
        for key in self.keys:
            ss = [self.score_term(t, key) for t in terms]
            present = [s for s in ss if s is not None]
            if len(present) >= min_match:
                hits.append((key, sum(present)))
        hits.sort(key=lambda t: (-t[1], t[0]))
        return hits[:k]

    def multiterm_query(self, terms: list[str], k=10) -> list[tuple[str, float]]:
        """Disjunction-of-scored-terms (prefix/wildcard/range/fuzzy expansion)."""
        return self.or_query(terms, k=k, min_match=1)

    def phrase_df_tf(
        self, terms: list[str], shifts: list[int] | None = None
    ) -> dict[str, int]:
        """Phrase match counts; ``shifts`` = per-slot position offsets
        (consecutive when None) — the push_back(offs) gap semantics."""
        if shifts is None:
            shifts = list(range(len(terms)))
        out = {}
        span = max(shifts) + 1
        for key in self.keys:
            toks = self.tokens[key]
            cnt = sum(
                1
                for i in range(len(toks) - span + 1)
                if all(toks[i + sh] == t for t, sh in zip(terms, shifts))
            )
            if cnt:
                out[key] = cnt
        return out

    def phrase_query(self, terms: list[str], k=10, k1=1.2, b=0.75) -> list[tuple[str, float]]:
        matches = self.phrase_df_tf(terms)
        dfp = len(matches)
        if dfp == 0:
            return []
        idf = math.log1p((self.n - dfp + 0.5) / (dfp + 0.5))
        hits = []
        for key, tf in matches.items():
            c0 = (k1 + 1.0) * idf
            c1 = k1 * (1 - b) + k1 * b * self.dl[key] / self.avgdl
            hits.append((key, c0 * tf / (c1 + tf)))
        hits.sort(key=lambda t: (-t[1], t[0]))
        return hits[:k]

    def eval_leaf(self, node) -> dict[str, float]:
        """Score one leaf node against THIS index (one field's postings)."""
        op = node[0]
        if op == "term":
            w, b = node[1], node[2]
            out = {}
            for key in self.keys:
                s = self.score_term(w, key, boost=b)
                if s is not None:
                    out[key] = s
            return out
        if op == "prefix":
            # multiterm leaf: disjunction-of-scored-terms over the dictionary
            # expansion, kSum within the leaf (multiterm_query.cpp:36-120) —
            # the whole expansion is ONE leg to any enclosing composite.
            p, b = node[1], node[2]
            terms = sorted(t for t in self.df if t.startswith(p))
            out: dict[str, float] = {}
            for key in self.keys:
                total, hit = 0.0, False
                for t in terms:
                    s = self.score_term(t, key, boost=b)
                    if s is not None:
                        total, hit = total + s, True
                if hit:
                    out[key] = total
            return out
        if op == "phrase":
            # nested-phrase leaf (engine compile_plans branch): tf = phrase
            # occurrence count under the slot shifts, idf = SUM of member
            # idfs (aggregated stats, phrase_filter.cpp:231-318), absent
            # terms contributing 0
            _, words, offsets, b = node
            shifts = [0]
            for i in range(1, len(words)):
                gap = offsets[i] if offsets and i < len(offsets) else 0
                shifts.append(shifts[-1] + 1 + int(gap))
            idf_sum = sum(self.idf(w) for w in words)
            out = {}
            for key, tf in self.phrase_df_tf(list(words), shifts).items():
                c0 = b * (1.2 + 1.0) * idf_sum
                c1 = 1.2 * (1 - 0.75) + 1.2 * 0.75 * self.dl[key] / self.avgdl
                out[key] = c0 * tf / (c1 + tf)
            return out
        if op == "terms":
            # mterm leaf with min_match + per-term boosts
            # (terms_filter.hpp:38-52): one leg PER MEMBER (duplicates count
            # twice toward min_match), effective boost = node x member,
            # kSum over present legs (executor _union default).
            _, words, boosts, min_match, b = node
            if len(words) == 0 or min_match > len(words):
                return {}  # unreachable criteria (terms_filter.cpp:117-121)
            per_key: dict[str, list[float]] = {}
            for w, wb in zip(words, boosts):
                for key in self.keys:
                    s = self.score_term(w, key, boost=b * wb)
                    if s is not None:
                        per_key.setdefault(key, []).append(s)
            if min_match == 0:
                # every doc matches; term hits keep their score, the rest 0
                # (terms_filter.cpp:123-133 Or(AllDocs(0), terms(mm=1)))
                out = {k: 0.0 for k in self.keys}
                out.update({k: sum(vs) for k, vs in per_key.items()})
                return out
            return {
                k: sum(vs) for k, vs in per_key.items() if len(vs) >= min_match
            }
        raise ValueError(f"bad leaf {node!r}")

    def eval_tree(self, node) -> dict[str, float]:
        """Evaluate a boolean filter tree → ``{doc_key: score}``, mirroring
        the engine's ``_eval_plan`` semantics (executor.py): kSum/kMax/kMin
        merge over matching legs (sort.hpp:464-468 MergeType), Or min_match
        over POSITIVE legs, Not children removed AFTER min_match, node boost
        multiplying the merged score.

        Node forms (plain tuples, engine-independent):
          ("term", word, boost)
          ("prefix", prefix, boost)   # multiterm: sum over expansion terms
          ("terms", words, boosts, min_match, boost)  # explicit term set
          ("and", parts, excludes, merge, boost)
          ("or", parts, excludes, min_match, merge, boost)

        Leaves dispatch through :meth:`eval_leaf`; composite semantics live
        in the free function :func:`eval_composite` so multi-field oracles
        reuse them with field-routed leaves.
        """
        return eval_composite(node, self.eval_leaf, self.keys)


def eval_composite(node, leaf_eval, all_keys) -> dict[str, float]:
    """Composite boolean semantics over ``leaf_eval``-scored leaves (see
    ScalarIndex.eval_tree). ``all_keys`` supplies the all-docs legs that Not
    children contribute under Or (group_filters, boolean_filter.cpp:366-411)."""
    op = node[0]
    if op in ("term", "prefix", "terms", "phrase"):
        return leaf_eval(node)

    def rec(n):
        return eval_composite(n, leaf_eval, all_keys)

    if op == "and":
        _, parts, excludes, merge, boost = node
        maps = [rec(p) for p in parts]
        keys = set(maps[0])
        for m in maps[1:]:
            keys &= set(m)
        out = {}
        for k in keys:
            vals = [m[k] for m in maps]
            v = (
                sum(vals)
                if merge == "sum"
                else (max(vals) if merge == "max" else min(vals))
            )
            out[k] = v * boost
        for e in excludes:
            for k in rec(e):
                out.pop(k, None)
        return out
    if op == "or":
        _, parts, excludes, min_match, merge, boost = node
        if min_match == 0:
            # explicit 0: the Or collapses to all-docs at its own boost,
            # parts ignored (Or::prepare, boolean_filter.cpp:492-496)
            return {k: float(boost) for k in all_keys}
        if min_match > len(parts) + len(excludes):
            # above the leg count (each Not contributes an all-docs leg):
            # unreachable (MinMatchQuery, boolean_filter.cpp:270-272)
            return {}
        maps = [rec(p) for p in parts]
        # Not under Or: each Not(B) contributes an all-docs leg at
        # boost 0 to the disjunction AND B to the exclusion set —
        # group_filters semantics, the same rewrite the engine's plan
        # builder performs.
        for _e in excludes:
            maps.append({k: 0.0 for k in all_keys})
        per_key: dict[str, list[float]] = {}
        for m in maps:
            for k, v in m.items():
                per_key.setdefault(k, []).append(v)
        out = {}
        for k, vs in per_key.items():
            if len(vs) >= min_match:
                v = (
                    sum(vs)
                    if merge == "sum"
                    else (max(vs) if merge == "max" else min(vs))
                )
                out[k] = v * boost
        for e in excludes:
            for k in rec(e):
                out.pop(k, None)
        return out
    raise ValueError(f"bad node {node!r}")
