package graft.ext

/** SFT (supervised fine-tuning) shard format: the chat-template and
  * loss-mask conventions that turn validated transcripts
  * (`text_chat_turns`) plus the integer token-id vocabulary
  * ([[Bpe.idVocabWithSpecials]]) into the (ids, mask) streams a
  * trainer's dataloader consumes.
  *
  * Template, fixed by convention (the Llama/ChatML family shape,
  * reduced to its load-bearing parts):
  *
  * {{{
  *   conversation = [BOS] message*      // one BOS per conversation
  *   message      = [USER|ASSISTANT] contentTokens* [EOS]
  * }}}
  *
  * Loss mask (1 = train, 0 = ignore): assistant CONTENT tokens and
  * the EOS that CLOSES an assistant turn are trained — the model must
  * learn both the reply and where to stop; everything else (BOS, role
  * markers, user content, user EOS) is context only. Masks are Long
  * (not Boolean) so window sums replay exactly in SQL.
  *
  * Specials are vocabulary entries injected STRUCTURALLY by the
  * template — the byte-level encoder can never emit them (reference
  * behavior note: the reference pipeline at
  * `/root/reference/azurestorage_blueprints` has no tokenizer surface
  * at all; this is north-star extension territory).
  */
object Sft {

  /** Reserved ids, position-locked to [[Bpe.SftSpecials]]. */
  val PadId: Long = 0L
  val BosId: Long = 1L
  val EosId: Long = 2L
  val UnkId: Long = 3L
  val UserId: Long = 4L
  val AsstId: Long = 5L

  /** Image-patch placeholder — the FIRST extension special, present
    * only in vocabularies built with [[Bpe.VlmSpecials]] (learned ids
    * shift by 7 there, not 6). A VLM example renders its image as
    * `n_patches` copies of this id inside a user turn (mask 0
    * throughout — patch embeddings are substituted at training time,
    * never predicted), interleaved with ordinary text turns. */
  val ImgId: Long = 6L

  /** Fill-in-the-middle sentinels (Bavarian et al. 2022), present
    * only in vocabularies built with [[Bpe.FimSpecials]] (learned ids
    * shift by 9 there). Extension specials are PER FAMILY: a FIM
    * vocab and a VLM vocab both extend the shared text-only prefix
    * 0..5 but assign their own ids from 6 up — the two shard formats
    * are distinct graded queries and never share a store, exactly the
    * [[Bpe.VlmSpecials]] discipline. */
  val FimPreId: Long = 6L
  val FimMidId: Long = 7L
  val FimSufId: Long = 8L

  /** Agentic tool-span sentinels, present only in vocabularies built
    * with [[Bpe.ToolSpecials]] (learned ids shift by 8 there). Same
    * per-family extension discipline as the VLM/FIM ids above. */
  val ToolCallId: Long = 6L
  val ToolResId: Long = 7L

  /** One message through the template: (ids, mask). Pure and
    * per-message — the per-partition unit of the map-only render
    * pass; conversation assembly (BOS + concat in turn order) is a
    * conversation-keyed aggregation on top. */
  def renderMessage(contentIds: Seq[Long], assistant: Boolean)
      : (Seq[Long], Seq[Long]) = {
    val marker = if (assistant) AsstId else UserId
    val m = if (assistant) 1L else 0L
    (marker +: contentIds :+ EosId,
      0L +: contentIds.map(_ => m) :+ m)
  }

  /** Assistant TOOL-CALL turn: `[ASSISTANT] [TOOLCALL] callIds [EOS]`.
    * Mask 0 on the scaffold (role marker + sentinel), 1 on the call
    * tokens — the serialized invocation IS assistant output the model
    * must learn to emit — and 1 on the closing EOS (it must learn to
    * stop and yield to the tool). Valid only under a
    * [[Bpe.ToolSpecials]] vocabulary. */
  def renderToolCall(callIds: Seq[Long]): (Seq[Long], Seq[Long]) =
    (AsstId +: ToolCallId +: callIds :+ EosId,
      0L +: 0L +: callIds.map(_ => 1L) :+ 1L)

  /** TOOL-RESULT turn: `[TOOLRES] resultIds [EOS]`, mask 0 throughout
    * — results are environment observations the model conditions on,
    * never predicts. */
  def renderToolResult(resultIds: Seq[Long]): (Seq[Long], Seq[Long]) =
    (ToolResId +: resultIds :+ EosId,
      0L +: resultIds.map(_ => 0L) :+ 0L)

  /** Conversation assembly: BOS, then the messages in turn order.
    * `messages` must already be ordered. */
  def assembleConversation(messages: Seq[(Seq[Long], Seq[Long])])
      : (Seq[Long], Seq[Long]) =
    (BosId +: messages.flatMap(_._1), 0L +: messages.flatMap(_._2))
}
