"""Ops tooling: relational store + model registry.

The reference ships a Postgres schema + seeding script (reference
database_setup.py:23-129) whose ``ml_models`` registry table is designed
but never actually read by the serving code (SURVEY.md §1 discrepancy
note). Here the same five-table schema runs on stdlib sqlite3 (no
sqlalchemy/psycopg2 in this image; the SQL is kept portable), seeding has
the same idempotent drop/create/dedup/rollback semantics, and the registry
is FUNCTIONAL: the train CLI can register exported artifacts and the serve
CLI can resolve ``--artifacts registry:<db>`` to the active model.
"""

from hhrs_tpu.db.registry import (
    ModelRegistry,
    connect,
    create_schema,
    seed_database,
)

__all__ = ["ModelRegistry", "connect", "create_schema", "seed_database"]
