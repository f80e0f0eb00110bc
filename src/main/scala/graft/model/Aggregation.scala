package graft.model

/** The closed set of consolidation kernels
  * (/root/reference/whisper.py:120-131, semantics at 553-575).
  *
  * `code` matches the reference's on-header enum so `info()` output is
  * comparable; `name` matches the user-facing method strings.
  */
sealed abstract class AggregationMethod(val code: Int, val name: String) {
  override def toString: String = name
}

object AggregationMethod {
  case object Average extends AggregationMethod(1, "average")
  case object Sum     extends AggregationMethod(2, "sum")
  case object Last    extends AggregationMethod(3, "last")
  case object Max     extends AggregationMethod(4, "max")
  case object Min     extends AggregationMethod(5, "min")
  case object AvgZero extends AggregationMethod(6, "avg_zero")
  case object AbsMax  extends AggregationMethod(7, "absmax")
  case object AbsMin  extends AggregationMethod(8, "absmin")

  val all: Seq[AggregationMethod] =
    Seq(Average, Sum, Last, Max, Min, AvgZero, AbsMax, AbsMin)

  private val byName = all.map(m => m.name -> m).toMap
  private val byCode = all.map(m => m.code -> m).toMap

  val default: AggregationMethod = Average // whisper.py:493-495

  def fromName(name: String): AggregationMethod =
    byName.getOrElse(
      name,
      throw new InvalidAggregationMethod(s"Unrecognized aggregation method: $name"))

  def fromCode(code: Int): AggregationMethod =
    byCode.getOrElse(
      code,
      throw new CorruptWhisperFile(s"Unable to read header", s"aggregationType=$code"))

  /** Pure-Scala consolidation kernel, semantics of whisper.py:553-575.
    *
    * `known` are the non-null slot values in chronological (grid) order;
    * `neighbor` is the full slot vector (None = empty slot) — required only
    * for avg_zero, which averages over ALL slots with empties as 0
    * (whisper.py:563-568).
    */
  def aggregate(method: AggregationMethod,
                known: Seq[Double],
                neighbor: Option[Seq[Option[Double]]] = None): Double =
    method match {
      case Average => known.sum / known.size
      case Sum     => known.sum
      case Last    => known.last
      case Max     => known.max
      case Min     => known.min
      case AvgZero =>
        val slots = neighbor.getOrElse(
          throw new InvalidAggregationMethod("Using avg_zero without neighborValues"))
        slots.map(_.getOrElse(0.0)).sum / slots.size
      case AbsMax => known.maxBy(math.abs) // sign preserved, whisper.py:570
      case AbsMin => known.minBy(math.abs) // sign preserved, whisper.py:572
    }
}
