"""Secure-HDFS login + ticket renewal (reference DataWriter.java:121-206).

The reference logs a Kerberos UGI in from principal/keytab at task start
(:121-160) and runs a daemon thread that re-logs-in every
``kerberos.ticket.renew.period.ms`` (:181-205). On Spark the cluster-side
equivalent is ``spark.kerberos.principal`` / ``spark.kerberos.keytab``
(token renewal is driver-managed), so this module matters for long-running
DRIVER-side clients (Hive metastore, direct HDFS maintenance like
compaction) that outlive delegation tokens.

The actual login call is injectable — no Kerberos stack exists in CI, and
the reference's own tests fake UGI the same way (TestWithSecureMiniDFSCluster
is the only secured suite). Everything around it (validation, initial login,
renewal cadence, clean shutdown) is real and deterministically tested.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from kafka_connect_hdfs_spark.config import ConfigException, HdfsSinkConfig


class KerberosTicketRenewer:
    """Periodic keytab re-login, the DataWriter renewal thread (:181-205).

    ``login_fn(principal, keytab)`` performs the actual login (UGI
    loginUserFromKeytab in the reference; a kinit subprocess or JVM call in
    a real deployment). Called once synchronously on ``start()`` (reference
    :121-160 logs in before the task touches HDFS), then every
    ``renew_period_ms`` from a daemon thread until ``stop()``.
    """

    def __init__(
        self,
        principal: str,
        keytab: str,
        renew_period_ms: int,
        login_fn: Callable[[str, str], None],
    ) -> None:
        if not principal or not keytab:
            # DataWriter.java:129-137 — both required for kerberos auth
            raise ConfigException(
                "hdfs.authentication.kerberos requires both "
                "connect.hdfs.principal and connect.hdfs.keytab"
            )
        self.principal = principal
        self.keytab = keytab
        self.renew_period_ms = renew_period_ms
        self._login_fn = login_fn
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.login_count = 0

    def _login(self) -> None:
        self._login_fn(self.principal, self.keytab)
        self.login_count += 1

    def start(self) -> None:
        self._login()  # initial synchronous login (:121-160)

        def run() -> None:
            # Event.wait doubles as the interruptible sleep, so stop() takes
            # effect immediately instead of after a renewal period
            while not self._stop.wait(self.renew_period_ms / 1000.0):
                self._login()

        self._thread = threading.Thread(
            target=run, name="kerberos-ticket-renew", daemon=True
        )
        self._thread.start()

    def stop(self, timeout_s: float = 5.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=timeout_s)


def build_renewer(
    cfg: HdfsSinkConfig, login_fn: Callable[[str, str], None]
) -> KerberosTicketRenewer | None:
    """None when kerberos is off (DataWriter skips the whole block)."""
    if not cfg.hdfs_authentication_kerberos:
        return None
    return KerberosTicketRenewer(
        cfg.connect_hdfs_principal,
        cfg.connect_hdfs_keytab,
        cfg.kerberos_ticket_renew_period_ms,
        login_fn,
    )
