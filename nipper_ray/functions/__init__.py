"""Scalar extraction functions (SURVEY.md §2.5 property operators).

The reference's per-selection scalar functions map to extraction-rule
kinds evaluated inside the batch kernel:

| reference op                         | rule kind    |
|--------------------------------------|--------------|
| Selection::text()  (property.rs:94)  | ``text``     |
| Selection::attr(n) (property.rs:22)  | ``attr:n``   |
| all matches' attr values             | ``attrs:n``  |
| Selection::html()  (property.rs:84)  | ``html``     |
| Selection::length  (property.rs:68)  | ``count``    |
| Selection::exists  (property.rs:79)  | ``exists``   |

Compose them as ``Rule(name, selector, kind)`` tuples and pass to
``nipper_ray.stages.extract_pages``.
"""

from ..stages.extract import DEFAULT_RULES, Rule  # noqa: F401
