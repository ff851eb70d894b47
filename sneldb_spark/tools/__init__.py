"""Operational CLI tools shipped with the package (console entry points
in pyproject.toml): stress (load generator), soak (long-running service
soak), wal_archive_manager (WAL archive CLI), inspector (storage
debugger). Repo-side `tools/*.py` shims keep `python tools/<name>.py`
working from a checkout."""
