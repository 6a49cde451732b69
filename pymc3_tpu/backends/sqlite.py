"""SQLite trace backend (cf. ``pymc3/backends/sqlite.py``).

One table per variable, buffered inserts (``sqlite.py:75``), ``load``
restoration (``sqlite.py:311``).
"""
from __future__ import annotations

import sqlite3
from typing import Dict

import numpy as np

from ..model import modelcontext
from .base import BaseTrace, MultiTrace
from .ndarray import NDArray

__all__ = ["SQLite", "load"]

TEMPLATES = {
    "table": ("CREATE TABLE IF NOT EXISTS [{table}] "
              "(recid INTEGER PRIMARY KEY AUTOINCREMENT, "
              "draw INTEGER, chain INT(5), "
              "{value_cols})"),
    "insert": ("INSERT INTO [{table}] "
               "(recid, draw, chain, {value_cols}) "
               "VALUES (NULL, ?, ?, {values})"),
    "max_draw": ("SELECT MAX(draw) FROM [{table}] "
                 "WHERE chain = ?"),
    "draw_count": ("SELECT COUNT(*) FROM [{table}] "
                   "WHERE chain = ?"),
    "select": ("SELECT * FROM [{table}] "
               "WHERE (chain = ?)"),
    "select_burn": ("SELECT * FROM [{table}] "
                    "WHERE (chain = ?) AND (draw > ?)"),
    "select_thin": ("SELECT * FROM [{table}] "
                    "WHERE (chain = ?) AND "
                    "(draw - (SELECT draw FROM [{table}] "
                    "WHERE chain = ? "
                    "ORDER BY draw LIMIT 1)) % ? = 0"),
    "select_burn_thin": ("SELECT * FROM [{table}] "
                         "WHERE (chain = ?) AND (draw > ?) "
                         "AND (draw - (SELECT draw FROM [{table}] "
                         "WHERE (chain = ?) AND (draw > ?) "
                         "ORDER BY draw LIMIT 1)) % ? = 0"),
    "select_point": ("SELECT * FROM [{table}] "
                     "WHERE (chain = ?) AND (draw = ?)"),
}


class SQLite(BaseTrace):
    """SQLite trace object (cf. ``sqlite.py:75``)."""

    supports_sampler_stats = False

    def __init__(self, name, model=None, vars=None, test_point=None):
        super().__init__(name, model, vars, test_point)
        self._var_cols = {}
        self.var_inserts = {}
        self.draw_idx = 0
        self._is_setup = False
        self._len = None
        self.db = _SQLiteDB(name)
        # Inserting sampling information is queued to avoid locks
        # caused by hitting the database with transactions each
        # iteration.
        self._queue = {varname: [] for varname in self.varnames}
        self._queue_limit = 5000

    def _var_col_names(self, varname):
        shape = self.var_shapes[varname]
        if not shape:
            return ["v1"]
        return ["v" + "_".join(map(str, (i + 1 for i in idx)))
                for idx in np.ndindex(*shape)]

    def setup(self, draws, chain, sampler_vars=None):
        if sampler_vars is not None:
            raise ValueError("SQLite backend does not support sampler stats.")
        super().setup(draws, chain, sampler_vars=None)
        self.db.connect()
        self.chain = chain
        for varname in self.varnames:
            cols = self._var_col_names(varname)
            self._var_cols[varname] = cols
            if not self._is_setup:
                self.db.cursor.execute(TEMPLATES["table"].format(
                    table=varname,
                    value_cols=", ".join(c + " FLOAT" for c in cols)))
            self.var_inserts[varname] = TEMPLATES["insert"].format(
                table=varname, value_cols=", ".join(cols),
                values=", ".join("?" for _ in cols))
        self.db.con.commit()
        self._is_setup = True
        # resume draw index
        try:
            self.db.cursor.execute(TEMPLATES["max_draw"].format(
                table=self.varnames[0]), (chain,))
            last = self.db.cursor.fetchall()[0][0]
            self.draw_idx = 0 if last is None else last + 1
        except Exception:
            self.draw_idx = 0

    def record(self, point, sampler_stats=None):
        if sampler_stats is not None:
            raise ValueError("SQLite backend does not support sampler stats.")
        for varname, value in zip(self.varnames, self._fn(point)):
            values = (self.draw_idx, self.chain) + tuple(
                np.ravel(value).tolist())
            self._queue[varname].append(values)
        if len(self._queue[self.varnames[0]]) > self._queue_limit:
            self._execute_queue()
        self.draw_idx += 1

    def record_batch(self, var_values, n, stats_batch=None):
        for i in range(n):
            point = {v: var_values[v][i] for v in self.varnames}
            for varname in self.varnames:
                values = (self.draw_idx, self.chain) + tuple(
                    np.ravel(point[varname]).tolist())
                self._queue[varname].append(values)
            self.draw_idx += 1
        self._execute_queue()

    def _execute_queue(self):
        for varname in self.varnames:
            if not self._queue[varname]:
                continue
            self.db.cursor.executemany(self.var_inserts[varname],
                                       self._queue[varname])
            self._queue[varname] = []
        self.db.con.commit()

    def close(self):
        if self._is_setup:
            self._execute_queue()
        self.db.close()

    # -- selection -----------------------------------------------------------
    def __len__(self):
        if not self._is_setup:
            return 0
        if self._len is None:
            self.db.connect()
            self.db.cursor.execute(TEMPLATES["draw_count"].format(
                table=self.varnames[0]), (self.chain,))
            self._len = self.db.cursor.fetchall()[0][0]
        return self._len

    def get_values(self, varname, burn=0, thin=1):
        if burn < 0:
            raise ValueError("Negative burn values not supported.")
        if thin < 1:
            raise ValueError("Only positive thin values are supported.")
        self.db.connect()
        varname = str(varname)
        if burn == 0 and thin == 1:
            call = TEMPLATES["select"].format(table=varname)
            params = (self.chain,)
        elif thin == 1:
            call = TEMPLATES["select_burn"].format(table=varname)
            params = (self.chain, burn - 1)
        elif burn == 0:
            call = TEMPLATES["select_thin"].format(table=varname)
            params = (self.chain, self.chain, thin)
        else:
            call = TEMPLATES["select_burn_thin"].format(table=varname)
            params = (self.chain, burn - 1, self.chain, burn - 1, thin)
        self.db.cursor.execute(call, params)
        rows = self.db.cursor.fetchall()
        shape = (-1,) + self.var_shapes[varname]
        vals = np.array([row[3:] for row in rows]).reshape(shape)
        return vals.astype(self.var_dtypes[varname])

    def _slice(self, idx):
        nd = NDArray(model=self.model, vars=self.vars)
        nd.chain = self.chain
        nd.samples = {v: self.get_values(v) for v in self.varnames}
        nd.draw_idx = len(self)
        return nd._slice(idx)

    def point(self, idx) -> Dict[str, np.ndarray]:
        idx = int(idx)
        if idx < 0:
            idx = len(self) + idx
        self.db.connect()
        point = {}
        for varname in self.varnames:
            self.db.cursor.execute(
                TEMPLATES["select_point"].format(table=varname),
                (self.chain, idx))
            rows = self.db.cursor.fetchall()
            if rows:
                point[varname] = np.array(rows[0][3:]).reshape(
                    self.var_shapes[varname])
        return point


class _SQLiteDB:
    def __init__(self, name):
        self.name = name
        self.con = None
        self.cursor = None
        self.connected = False

    def connect(self):
        if self.connected:
            return
        self.con = sqlite3.connect(self.name)
        self.connected = True
        self.cursor = self.con.cursor()

    def close(self):
        if not self.connected:
            return
        self.con.commit()
        self.cursor.close()
        self.con.close()
        self.connected = False


def load(name, model=None) -> MultiTrace:
    """Load SQLite database (cf. ``sqlite.py:311``)."""
    db = _SQLiteDB(name)
    db.connect()
    varnames = _get_table_list(db.cursor)
    if len(varnames) == 0:
        raise ValueError(f"Can not get variable list for database {name}")
    chains = _get_chain_list(db.cursor, varnames[0])

    model = modelcontext(model)
    straces = []
    for chain in chains:
        strace = SQLite(name, model=model)
        strace.varnames = varnames
        strace.chain = chain
        strace._is_setup = True
        strace.db = db  # Share the db with all traces.
        straces.append(strace)
    return MultiTrace(straces)


def _get_table_list(cursor):
    """Return a list of table names in the current database."""
    cursor.execute("SELECT name FROM sqlite_master WHERE type='table' "
                   "AND NOT name LIKE 'sqlite%'")
    return [row[0] for row in cursor.fetchall()]


def _get_var_strs(cursor, varname):
    cursor.execute(f"SELECT * FROM [{varname}]")
    col_names = (col_descr[0] for col_descr in cursor.description)
    return [name for name in col_names if name.startswith("v")]


def _get_chain_list(cursor, varname):
    """Return a list of sorted chains for `varname`."""
    cursor.execute(f"SELECT DISTINCT chain FROM [{varname}]")
    chains = sorted([chain[0] for chain in cursor.fetchall()])
    return chains
