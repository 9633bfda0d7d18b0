"""Table-driven tests of the URL canonicalization kernel against the
reference's behavior (forum_dl/extractors/common.py:35-62), including the
quirks called out in SURVEY.md §5."""

from __future__ import annotations

import pytest

from forum_dl_spark.urls import get_relative_url, normalize_url


@pytest.mark.parametrize(
    "url,kwargs,expected",
    [
        # default: drop query/fragment, append slash
        ("https://x.example/a/b?q=1#f", {}, "https://x.example/a/b/"),
        # suffix removal (index.php default)
        ("https://x.example/forum/index.php", {}, "https://x.example/forum/"),
        # quirk: suffix removed only when keep_queries empty or no query
        # (common.py:44)
        (
            "https://x.example/index.php?f=3",
            {"keep_queries": ("f",)},
            "https://x.example/index.php?f=3",
        ),
        (
            "https://x.example/index.php",
            {"keep_queries": ("f",)},
            "https://x.example/",
        ),
        # keep only whitelisted query keys
        (
            "https://x.example/viewforum.php?f=3&sid=abc",
            {"remove_suffixes": (), "keep_queries": ("f", "t")},
            "https://x.example/viewforum.php?f=3",
        ),
        # append_slash=False
        ("https://x.example/", {"append_slash": False}, "https://x.example"),
        # double trailing-slash strip (common.py:42,48)
        ("https://x.example/a/index.php/", {}, "https://x.example/a/"),
        # no slash appended when a query survives (common.py:59-60)
        (
            "https://x.example/t?t=5",
            {"keep_queries": ("t",)},
            "https://x.example/t?t=5",
        ),
    ],
)
def test_normalize_url(url, kwargs, expected):
    assert normalize_url(url, **kwargs) == expected


def test_get_relative_url():
    assert get_relative_url("https://x.example/a/b/c", "https://x.example/a/") == "b/c"
    with pytest.raises(ValueError):
        get_relative_url("https://x.example/elsewhere", "https://x.example/a/")
