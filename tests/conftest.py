import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    # session OWNERSHIP: only shut down a session this fixture created —
    # ignore_reinit_error silently adopts a caller's existing session (e.g.
    # pytest.main() run from a live Ray driver), and tearing that down would
    # kill the caller's cluster out from under it
    created = not ray.is_initialized()
    if created:
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    if created:
        ray.shutdown()
