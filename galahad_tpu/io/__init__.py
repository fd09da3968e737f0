from . import qplib  # noqa: F401
