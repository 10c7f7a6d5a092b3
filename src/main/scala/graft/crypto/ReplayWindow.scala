package graft.crypto

/** Sliding-window replay protection over per-producer sequence numbers —
  * behavioral port of confidentialstorm/enclave/.../security/ReplayWindow.java:44-105
  * (default window 128, ConfidentialBoltService.java:54).
  *
  * Bit 0 anchors the highest sequence seen; older sequences sit at increasing
  * offsets. Accepts each in-window sequence exactly once; rejects negatives,
  * replays, and anything older than `maxSeen - windowSize`.
  *
  * In the Spark engine this is keyed state per `producer_id`
  * (state = (maxSeen, window bits)) or a codec-level check off the hot path.
  */
final class ReplayWindow(val windowSize: Int = 128) extends Serializable {
  require(windowSize > 0 && windowSize <= 4096, "windowSize must be in (0, 4096]")

  private var maxSeen: Long = -1L
  private var window = new java.util.BitSet(windowSize)

  def accept(sequence: Long): Boolean = {
    if (sequence < 0) return false
    if (maxSeen >= 0 && sequence <= maxSeen - windowSize) return false

    if (sequence > maxSeen) {
      val shift = sequence - maxSeen
      if (shift >= windowSize) window.clear()
      else if (maxSeen >= 0) {
        val shifted = new java.util.BitSet(windowSize)
        val by = shift.toInt
        var i = 0
        while (i < windowSize - by) {
          if (window.get(i)) shifted.set(i + by)
          i += 1
        }
        window = shifted
      } else window.clear()
      maxSeen = sequence
      window.set(0)
      true
    } else {
      val offset = (maxSeen - sequence).toInt
      if (offset >= windowSize) false
      else if (window.get(offset)) false
      else { window.set(offset); true }
    }
  }

  def highestSeen: Long = maxSeen
}
