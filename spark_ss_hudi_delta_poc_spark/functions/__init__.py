from .hashing import md5_long, seeded_md5_long  # noqa: F401
