"""Request-level result caching — the harness's checkpoint/resume mechanism.

Same behavior as the reference's ``CachingLM`` (lm_eval/base.py:886-947):
every (method, args) pair is keyed by sha256 and stored in sqlite, so a killed
evaluation resumes from the last completed request. The reference used the
``sqlitedict`` package; this is a dependency-free stdlib ``sqlite3``
dict-protocol equivalent.
"""

import hashlib
import json
import os
import pickle
import sqlite3

from .api import CacheHook


def hash_args(attr, args):
    # identical keying scheme to reference base.py:866-868 so cache semantics
    # (including collision behavior across request types) match
    dat = json.dumps([attr] + list(args))
    return hashlib.sha256(dat.encode("utf-8")).hexdigest()


class SqliteKV:
    """Minimal persistent dict over stdlib sqlite3 (pickled values)."""

    def __init__(self, path: str):
        self.path = path
        if os.path.dirname(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._conn.execute(
            "CREATE TABLE IF NOT EXISTS kv (key TEXT PRIMARY KEY, value BLOB)"
        )
        self._conn.commit()

    def __contains__(self, key):
        cur = self._conn.execute("SELECT 1 FROM kv WHERE key = ?", (key,))
        return cur.fetchone() is not None

    def __getitem__(self, key):
        cur = self._conn.execute("SELECT value FROM kv WHERE key = ?", (key,))
        row = cur.fetchone()
        if row is None:
            raise KeyError(key)
        return pickle.loads(row[0])

    def __setitem__(self, key, value):
        self._conn.execute(
            "INSERT OR REPLACE INTO kv (key, value) VALUES (?, ?)",
            (key, pickle.dumps(value)),
        )

    def __len__(self):
        return self._conn.execute("SELECT COUNT(*) FROM kv").fetchone()[0]

    def commit(self):
        self._conn.commit()

    def close(self):
        self._conn.commit()
        self._conn.close()


class CachingLM:
    """LM wrapper that serves cached results and runs the rest (base.py:886-947).

    Cache-hit path preserves request order: misses are dispatched to the inner
    LM as one list and spliced back into the result positions.
    """

    def __init__(self, lm, cache_db: str):
        self.lm = lm
        self.cache_db = cache_db
        self.dbdict = SqliteKV(cache_db)
        lm.set_cache_hook(self.get_cache_hook())

    def __getattr__(self, attr):
        lm_attr = getattr(self.lm, attr)
        if not callable(lm_attr):
            return lm_attr

        def fn(requests):
            res = []
            remaining_reqs = []
            for req in requests:
                hsh = hash_args(attr, req)
                if hsh in self.dbdict:
                    ob = self.dbdict[hsh]
                    assert ob is not None
                    res.append(ob)
                else:
                    res.append(None)
                    remaining_reqs.append(req)

            rem_res = getattr(self.lm, attr)(remaining_reqs)

            resptr = 0
            for req, r in zip(remaining_reqs, rem_res):
                while res[resptr] is not None:
                    resptr += 1
                res[resptr] = r
                self.dbdict[hash_args(attr, req)] = r
            self.dbdict.commit()
            return res

        return fn

    def get_cache_hook(self):
        return CacheHook(self)
