"""Readers and writers: TSV with sentinels, STAR logs, RSEM results,
idxstats, BED, and JSON track documents (SURVEY §2.1 SRC*/SNK*)."""
