"""Reusable engine operators, grouped by concern.

Each module exposes plain functions ``DataFrame -> DataFrame`` (or
Column helpers) so they compose like any other DataFrame method; the
named queries in ``..plans`` wire them to the driver's tables.
"""
