from tests.oracle import oracle  # noqa: F401
