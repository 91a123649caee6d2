package graft.catalog

/** Recursive dict merge, update-side wins on scalar conflict
  * (reference: `etl_manager/utils.py:38-51`, `_dict_merge`). Used to
  * layer format-specific spec over the base spec and the user's
  * `glue_specific` override over both (`meta.py:432-481`). */
object DeepMerge {

  type JMap = Map[String, Any]

  def merge(base: JMap, update: JMap): JMap =
    update.foldLeft(base) { case (acc, (k, v)) =>
      (acc.get(k), v) match {
        case (Some(a: scala.collection.Map[_, _]), b: scala.collection.Map[_, _]) =>
          acc + (k -> merge(
            a.asInstanceOf[scala.collection.Map[String, Any]].toMap,
            b.asInstanceOf[scala.collection.Map[String, Any]].toMap))
        case _ => acc + (k -> v)
      }
    }
}
