"""Scalar/text functions (the analog of the reference's lib/utils.js)."""
