from . import quat, se3, so3  # noqa: F401
