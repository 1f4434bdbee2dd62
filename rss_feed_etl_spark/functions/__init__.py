from . import hashing, text, timestamps  # noqa: F401
