"""End-to-end pipeline stages mirroring the reference's analytic DAG
(SURVEY §3.3 entry point C): STARQC → PASS filter → sex check → matrix
assembly → conflict report → tracks → combine/merge."""
