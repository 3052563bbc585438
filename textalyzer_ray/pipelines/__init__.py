"""Composable Ray Data pipelines — the public API of the engine.

Every reference subcommand (SURVEY.md §3) and every training-pipeline
extension is a function ``Dataset -> Dataset`` (or a small builder) here;
``__ray_entry__.queries()`` registers them for the driver.
"""
