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
  *  - [[ConcurrentAppendException]]: a winning commit added files that
  *    MAY contain rows matching a reads-based transaction's predicate
  *    (files whose stats prove no match are rebased past instead —
  *    delta's Serializable conflict check).
  *  - [[ConcurrentDeleteDeleteException]]: the winning commit removed a
  *    file this transaction also removes — both acted on the same data.
  *  - [[ConcurrentWriteException]]: any other reads-based conflict the
  *    checks above cannot prove safe.
  */
class ConcurrentWriteException(msg: String)
    extends java.util.ConcurrentModificationException(msg)

class ConcurrentAppendException(msg: String)
    extends ConcurrentWriteException(msg)

class ConcurrentDeleteDeleteException(msg: String)
    extends ConcurrentWriteException(msg)

class MetadataChangedException(msg: String)
    extends ConcurrentWriteException(msg)

class ProtocolChangedException(msg: String)
    extends ConcurrentWriteException(msg)

class ConcurrentTransactionException(msg: String)
    extends ConcurrentWriteException(msg)
