"""Search API over a committed index snapshot (reference entry point 3,
SURVEY.md §3.3 — the ES query contract, served natively).

``Searcher`` loads the catalog once, keeps docs/term_stats DataFrames cached,
and serves top-k queries through either scoring path:

- ``mode="blockmax"`` (default): metadata-driven range/block skipping
  (operators/wand.py) — the scale path.
- ``mode="exhaustive"``: pure-DataFrame scorer (operators/search.py) — the
  oracle-verifiable path; rank-identical by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.search import (
    analyze_query,
    analyze_query_seq,
    phrase_filter_docids,
    search_exhaustive,
)
from ..operators.wand import search_blockmax
from ..sources import catalog as cat


class Searcher:
    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        snapshot: str | None = None,
        allow_analyzer_mismatch: bool = False,
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.catalog = cat.read_catalog(index_dir, snapshot)
        self._check_analyzer_version(allow_analyzer_mismatch)
        snap = self.catalog.snapshot
        self.segments = cat.read_table(spark, index_dir, "segments", snap)
        self.term_stats = cat.read_table(spark, index_dir, "term_stats", snap).cache()
        # Cache only metadata + per-field dl columns: `content` is the doc
        # body — at corpus scale caching it would hold ~the whole corpus in
        # executor memory for queries that never read it.  Display/snippet
        # columns are fetched lazily per result page (docs_content below).
        self.docs = (
            cat.read_table(spark, index_dir, "docs", snap).drop("content").cache()
        )

    def _check_analyzer_version(self, allow_mismatch: bool) -> None:
        """Refuse to search an index whose analyzer implementation differs
        from the current code's: query terms would be stemmed/tokenized
        differently than the stored postings — silent wrong results (the
        catalog used to record only the analyzer NAME, which stayed
        'default' across the r1→r2 EnglishMinimalStemmer→KStem change)."""
        from ..functions.analysis import ANALYZER_VERSIONS

        # every analyzed chain must match: the content field's AND each
        # extra field's (path/code chains are analyzed at query time too —
        # a fold-table change in the code chain with an unchanged default
        # chain is exactly the silent mismatch this guard exists to catch)
        checks = [(self.catalog.analyzer, getattr(self.catalog, "analyzer_version", None))]
        for fld, meta in (self.catalog.fields or {}).items():
            checks.append((meta["analyzer"], meta.get("analyzer_version")))
        for analyzer, stored in checks:
            current = ANALYZER_VERSIONS.get(analyzer)
            if stored is None or current is None or stored == current:
                continue
            msg = (
                f"index {self.index_dir!r} was built with analyzer "
                f"{analyzer!r} version {stored!r}, but this code "
                f"implements version {current!r}; query-time analysis would "
                "not match the stored postings. Rebuild the index, or pass "
                "allow_analyzer_mismatch=True to search anyway."
            )
            if allow_mismatch:
                import warnings

                warnings.warn(msg)
            else:
                raise ValueError(msg)

    def docs_content(self) -> DataFrame:
        """(docid, content) — lazy, uncached: the display/snippet fetch path.
        Parquet column pruning keeps this a 2-column scan; callers join it
        per result page rather than holding content in the serving cache."""
        return cat.read_table(
            self.spark, self.index_dir, "docs", self.catalog.snapshot
        ).select("docid", "content")

    def _field_conf(self, field: str) -> tuple[str, str, float, str]:
        """→ (analyzer, term_prefix, avgdl, dl_col) for a field (reference:
        per-field analyzers in the mapping, elastic/index.go:115-146)."""
        if field == "content":
            return self.catalog.analyzer, "", self.catalog.avgdl, "dl"
        meta = (self.catalog.fields or {}).get(field)
        if meta is None:
            raise ValueError(f"field {field!r} not indexed")
        from .build_index import FIELD_SEP

        return meta["analyzer"], field + FIELD_SEP, float(meta["avgdl"]), meta["dl_col"]

    def query_terms(self, query: str, field: str = "content") -> list[str]:
        analyzer, prefix, _, _ = self._field_conf(field)
        return [prefix + t for t in analyze_query(query, analyzer)]

    def search(
        self,
        query: str,
        k: int = 10,
        mode: str = "blockmax",
        doc_filter: Column | None = None,
        with_docs: bool = True,
        field: str = "content",
        operator: str = "or",
    ) -> DataFrame:
        """``operator``: 'or' (ES match default) or 'and' (every term must
        match; conjunctive queries run on the exhaustive scorer)."""
        _, _, avgdl, dl_col = self._field_conf(field)
        terms = self.query_terms(query, field)
        docs_side = self.docs
        if dl_col != "dl":
            docs_side = docs_side.withColumn("dl", F.col(dl_col))
        if operator == "and":
            hits = search_exhaustive(
                self.segments, self.term_stats, docs_side, terms, k, avgdl,
                doc_filter, require_all=True,
            )
            if not with_docs:
                return hits
            return hits.join(
                self.docs.select("docid", "url", "lang"), "docid", "left"
            ).orderBy(F.desc("score"), F.asc("docid"))
        if mode == "exhaustive":
            hits = search_exhaustive(
                self.segments,
                self.term_stats,
                docs_side,
                terms,
                k,
                avgdl,
                doc_filter,
            )
        else:
            n_ranges = -(-max(self.catalog.n_docs, 1) // self.catalog.docs_per_range)
            hits = search_blockmax(
                self.spark,
                self.segments,
                self.term_stats,
                docs_side,
                terms,
                k,
                avgdl,
                doc_filter,
                n_ranges_hint=n_ranges,
            )
        if not with_docs:
            return hits
        return (
            hits.join(self.docs.select("docid", "url", "lang"), "docid", "left")
            .orderBy(F.desc("score"), F.asc("docid"))
        )

    def phrase_search(
        self, phrase: str, k: int = 10, field: str = "content"
    ) -> DataFrame:
        """Positions-based phrase query (requires with_positions index).

        ``field``: phrase over an extra field's namespaced postings — the
        ES ``match_phrase`` on a sub-field (text fields default to
        index_options=positions, so field phrase is part of the reference
        contract; per-field analyzers elastic/index.go:115-146).  The
        field's analyzer produces the token sequence, its ``<field>\\x1f``
        prefix scopes both the adjacency check and the BM25 scoring to the
        field's own postings/dl/avgdl."""
        if not self.catalog.with_positions:
            raise ValueError("index was built without positions")
        analyzer, prefix, avgdl, dl_col = self._field_conf(field)
        # adjacency check needs the raw token SEQUENCE (duplicates kept:
        # "data data" must match two adjacent occurrences); BM25 scoring
        # uses the deduplicated match-query term list
        term_seq = [prefix + t for t in analyze_query_seq(phrase, analyzer)]
        terms = self.query_terms(phrase, field)
        docids = phrase_filter_docids(self.segments, term_seq)
        docs_side = self.docs
        if dl_col != "dl":
            docs_side = docs_side.withColumn("dl", F.col(dl_col))
        scored = search_exhaustive(
            self.segments,
            self.term_stats,
            docs_side,
            terms,
            k=None,
            avgdl=avgdl,
        )
        return (
            scored.join(docids, "docid")
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )

    def highlight(self, term: str, window: int = 30) -> DataFrame:
        """(docid, start, end, snippet) for every occurrence of ``term`` —
        spans decoded from the stored offsets payload, snippets cut with
        JVM substrings (requires with_offsets index; ES highlighting
        analog, elastic/index.go:208-218)."""
        if not self.catalog.with_offsets:
            raise ValueError("index was built without offsets")
        from ..operators.highlight import highlight_term

        analyzed = analyze_query_seq(term, self.catalog.analyzer)
        if len(analyzed) != 1:
            raise ValueError("highlight takes a single term")
        return highlight_term(
            self.segments, self.docs_content(), analyzed[0], window=window
        )

    def lookup(self, doc_id: str) -> DataFrame:
        """Point GET by document id (reference test-only read path,
        elastic/client.go:231-246) — K8.  Reads the uncached table so the
        full document (including content) comes back; the id predicate is
        pushed to the parquet scan."""
        return cat.read_table(
            self.spark, self.index_dir, "docs", self.catalog.snapshot
        ).filter(F.col("id") == doc_id)
