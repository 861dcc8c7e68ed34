"""Shared column-expression helpers (all Catalyst built-ins, no UDFs)."""
