"""The reference's four entry points as composed DataFrame programs
(SURVEY.md §3): ingest, parse, impute, export."""
