"""SQL surface: sql template tag, Query() builder, ClickHouse-dialect
function translation (SURVEY.md §2.2, §2.9, §3.3).
"""
