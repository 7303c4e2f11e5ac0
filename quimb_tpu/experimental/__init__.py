"""quimb_tpu.experimental — VMC, autojit, and other extras
(reference ``quimb/experimental/``)."""
