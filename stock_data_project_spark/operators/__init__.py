"""Composable DataFrame -> DataFrame operators.

Every operator partitions its windows/aggregations by a series key so
work parallelizes across keys (the 100 TB layout: many series, each
modest), keeps expressions in built-in functions (whole-stage
codegen), and never collects to the driver.
"""
