from fots.ops.rroi_align import rroi_align  # noqa: F401
