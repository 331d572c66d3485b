package graft.delta

/** Typed commit-conflict surface (reference
  * kernel/src/transaction/mod.rs:327-590 — `CommitResult::Conflicted`
  * with per-cause conflict checks). A blind append RETRIES past plain
  * concurrent appends after re-validating the winning commits; these
  * exceptions are the cases that must surface instead:
  *  - [[MetadataChangedException]] / [[ProtocolChangedException]]: the
  *    table definition changed under the transaction — silently
  *    skipping over it would commit against a schema/protocol the
  *    staged data was never validated for.
  *  - [[ConcurrentTransactionException]]: the winning commit carries a
  *    SetTransaction for the same appId — the idempotency marker this
  *    transaction relies on is stale.
  *  - [[ConcurrentWriteException]]: any reads-based transaction
  *    (DELETE/UPDATE) racing another writer — the read snapshot may no
  *    longer hold.
  */
class ConcurrentWriteException(msg: String)
    extends java.util.ConcurrentModificationException(msg)

class MetadataChangedException(msg: String)
    extends ConcurrentWriteException(msg)

class ProtocolChangedException(msg: String)
    extends ConcurrentWriteException(msg)

class ConcurrentTransactionException(msg: String)
    extends ConcurrentWriteException(msg)
