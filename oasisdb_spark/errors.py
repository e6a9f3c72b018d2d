"""Error surface mirroring the reference's pkg/errors/errors.go names."""


class OasisError(Exception):
    """Base error."""


class ErrCollectionExists(OasisError):
    """Duplicate create — reference internal/db/collection.go:55-57."""


class ErrCollectionNotFound(OasisError):
    """Missing collection — collection.go:98-100,129-131."""


class ErrInvalidCollectionName(OasisError):
    """Empty name — collection.go:39-41."""


class ErrInvalidDimension(OasisError):
    """dimension <= 0 — collection.go:42-44."""


class ErrDimensionMismatch(OasisError):
    """size(vector) != collection.dimension — document.go:70-73,280-285."""


class ErrDocumentNotFound(OasisError):
    """Missing document — document.go:95-120 path."""


class ErrInvalidParams(OasisError):
    """Bad index params (e.g. IVFPQ dim % m != 0, ivfpq.go:98-106;
    invalid set_params key, ivf.go:379-413)."""
