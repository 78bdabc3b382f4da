"""Structured Streaming surface (extension; the reference is batch-only
— SURVEY.md §2.2 notes streaming as absent).

The batch window queries in ``queries/windows.py`` use the exact
expressions (``F.window``, ``F.session_window``) that run under
``readStream`` here — one logical definition, two execution modes.
"""
