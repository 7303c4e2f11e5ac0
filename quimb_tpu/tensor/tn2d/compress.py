"""2D tensor network compression (reference
``quimb/tensor/tn2d/compress.py``): a thin dispatcher over the
arbitrary-geometry compression family — in the reference the
2D-specific method table is likewise empty and all methods fall
through to ``tensor_network_ag_compress`` (tn2d/compress.py:78).
"""

from ..tnag.compress import tensor_network_ag_compress

_TN2D_COMPRESS_METHODS = {}


def tensor_network_2d_compress(
    tn,
    max_bond=None,
    cutoff=1e-10,
    method="local-early",
    site_tags=None,
    inplace=False,
    **kwargs,
):
    """Compress a 2D-like tensor network (reference
    ``tensor_network_2d_compress`` tn2d/compress.py:7): dispatch to a
    registered 2D-specific method if one exists, otherwise fall back
    to the arbitrary-geometry methods ("local-early", "local-late",
    "superorthogonal", "l2bp").
    """
    try:
        fn = _TN2D_COMPRESS_METHODS[method]
    except KeyError:
        return tensor_network_ag_compress(
            tn, max_bond=max_bond, cutoff=cutoff, method=method,
            inplace=inplace, **kwargs,
        )
    return fn(
        tn, max_bond=max_bond, cutoff=cutoff, site_tags=site_tags,
        inplace=inplace, **kwargs,
    )
