from .schedule import NoiseScheduleVP, get_polynomial_schedule, interpolate_fn  # noqa: F401
