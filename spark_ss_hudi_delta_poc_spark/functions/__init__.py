from .hashing import (  # noqa: F401
    affine_constants,
    affine_hash,
    md5_long,
    md5_long48,
    seeded_md5_long,
)
