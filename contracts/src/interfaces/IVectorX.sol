// SPDX-License-Identifier: MIT
pragma solidity ^0.8.25;

/// @notice ABI-compatible interface of the VectorX Avail light client
///         (events/errors match the reference deployment's ABI so existing
///         consumers and indexers keep working; see the reference
///         contracts/src/interfaces/IVectorX.sol:11-56).
interface IVectorX {
    /// @notice A header range proof was requested from the gateway.
    event HeaderRangeRequested(
        uint32 trustedBlock,
        bytes32 trustedHeader,
        uint64 authoritySetId,
        bytes32 authoritySetHash,
        uint32 targetBlock
    );

    /// @notice A rotate proof was requested from the gateway.
    event RotateRequested(uint64 currentAuthoritySetId, bytes32 currentAuthoritySetHash);

    /// @notice The light client head advanced.
    event HeadUpdate(uint32 blockNumber, bytes32 headerHash);

    /// @notice Data + state commitments stored for the range (startBlock, endBlock].
    event HeaderRangeCommitmentStored(
        uint32 startBlock,
        uint32 endBlock,
        bytes32 dataCommitment,
        bytes32 stateCommitment,
        uint32 headerRangeCommitmentTreeSize
    );

    /// @notice A new authority set hash was stored.
    event AuthoritySetStored(uint64 authoritySetId, bytes32 authoritySetHash);

    error NextAuthoritySetExists();
    error ContractFrozen();
    error TrustedHeaderNotFound();
    error AuthoritySetNotFound();
    error OldAuthoritySetId();
}
